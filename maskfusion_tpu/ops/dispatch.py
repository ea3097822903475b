"""Backend dispatch: Pallas kernels on TPU, pure-XLA elsewhere.

Config.use_pallas: "auto" (TPU -> pallas), "never", "always"."""

from __future__ import annotations

import functools


@functools.lru_cache(maxsize=1)
def on_tpu() -> bool:
    try:
        import jax

        return "tpu" in jax.devices()[0].device_kind.lower()
    except Exception:
        return False


def use_pallas(mode: str = "auto") -> bool:
    if mode == "never":
        return False
    if mode == "always":
        return True
    return on_tpu()
