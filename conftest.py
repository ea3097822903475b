# Root conftest: force tests onto a virtual 8-device CPU mesh so multi-chip
# sharding paths compile/execute without TPU hardware.
#
# Note: this environment's sitecustomize registers a remote-TPU ("axon") PJRT
# backend and calls jax.config.update("jax_platforms", "axon,cpu") at
# interpreter start, which overrides the JAX_PLATFORMS env var — so we must
# override the *config* again here, before any backend is initialised.
import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: XLA:CPU compiles are slow on this box and the
# suite re-runs the same static shapes every time.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# sitecustomize imports jax at interpreter start, BEFORE the env vars above
# are set — jax's config defaults snapshot the environment at import time,
# so the cache env vars are silently ignored (verified: config reads None).
# Re-apply them through jax.config, which is authoritative post-import.
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
