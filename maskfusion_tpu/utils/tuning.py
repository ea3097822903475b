"""Per-device-generation tuning registry.

Equivalent of the reference's GPUConfig per-GPU-name thread/block tables
(Core/Utils/GPUConfig.h:50-146): the TPU analogue is per-generation choices
of bucket policy and diagnostics cadence, looked up from the runtime device
kind (the reference keys on the CUDA device name).  The engine reads ONE
DeviceTuning at construction (MaskFusion.__init__) and consumes it in
_bucket_for (per-model processing buckets) and the diagnostics flush
interval — the same knobs GPUConfig feeds into the reduction launches.
"""

from __future__ import annotations

import dataclasses
from typing import Dict


@dataclasses.dataclass(frozen=True)
class DeviceTuning:
    # bucketing policy for per-surfel passes (mapping/surfel_map.choose_bucket):
    # the bucket FLOOR bounds how small the per-surfel dispatches get (tiny
    # buckets recompile often and under-fill the VPU lanes), the headroom
    # bounds how often growth forces a re-bucket (each rung is a recompile
    # on cold caches)
    min_bucket_global: int = 1 << 18
    min_bucket_object: int = 1 << 16
    headroom_global: int = 81920
    headroom_object: int = 16384
    # diagnostics fetch interval in frames (host round trips are
    # transport-dependent: ~230 ms on the remote axon tunnel, ~0 locally)
    diag_interval: int = 8


_REGISTRY: Dict[str, DeviceTuning] = {
    # keyed by jax.devices()[0].device_kind prefixes
    "TPU v5": DeviceTuning(),
    "TPU v4": DeviceTuning(),
    # v6e: double the VPU width — keep per-surfel dispatches fuller
    "TPU v6": DeviceTuning(min_bucket_global=1 << 19,
                           min_bucket_object=1 << 17),
    # CPU (tests / virtual meshes): dispatches are local and cheap;
    # the defaults are already correct, listed for explicitness
    "cpu": DeviceTuning(),
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
