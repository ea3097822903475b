"""Import FIRST in ad-hoc scripts to force the CPU backend (the axon
sitecustomize otherwise routes everything over the TPU tunnel)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
import jax
jax.config.update("jax_platforms", "cpu")
