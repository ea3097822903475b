"""Per-device-generation tuning registry.

Equivalent of the reference's GPUConfig per-GPU-name thread/block tables
(Core/Utils/GPUConfig.h:50-146): the TPU analogue is per-generation choices
of bucket policy, tap-table widths and sort block parameters, looked up from
the runtime device kind (the reference keys on glGetString(GL_RENDERER))."""

from __future__ import annotations

import dataclasses
from typing import Dict


@dataclasses.dataclass(frozen=True)
class DeviceTuning:
    # bucketing policy for per-surfel passes (mapping/surfel_map.choose_bucket)
    min_bucket: int = 1 << 18
    bucket_headroom: int = 1 << 17
    # window-tap row table width (padding to sublane-friendly sizes)
    tap_row_width: int = 8
    # diagnostics fetch interval (host round trips are transport-dependent)
    diag_interval: int = 8


_REGISTRY: Dict[str, DeviceTuning] = {
    # keyed by jax.devices()[0].device_kind prefixes
    "TPU v5": DeviceTuning(),
    "TPU v4": DeviceTuning(min_bucket=1 << 18, bucket_headroom=1 << 17),
    "TPU v6": DeviceTuning(min_bucket=1 << 19, bucket_headroom=1 << 18),
    "cpu": DeviceTuning(min_bucket=1 << 16, bucket_headroom=1 << 15,
                        diag_interval=1),
}

_DEFAULT = DeviceTuning()


def get_tuning() -> DeviceTuning:
    try:
        import jax

        kind = jax.devices()[0].device_kind
    except Exception:
        return _DEFAULT
    for prefix, tuning in _REGISTRY.items():
        if kind.lower().startswith(prefix.lower()):
            return tuning
    return _DEFAULT
