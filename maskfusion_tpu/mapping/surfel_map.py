"""HBM-resident per-object surfel maps.

TPU-native re-design of the reference's double-buffered transform-feedback
VBOs (Core/Model/Model.h:284-287, Core/Shaders/Vertex.cpp:22-43): one SoA
pytree of statically-shaped arrays per model plus a live count.  The
reference packs each surfel as 3 vec4s — (pos, conf) / (encoded rgb, _,
init_time, last_seen) / (normal, radius); we keep the same fields unpacked
(color as 3 channels instead of the 24-bit float encoding of
color_encoding.glsl:19-34).  "Double buffering" becomes functional updates
with donated buffers; the GL_TRANSFORM_FEEDBACK_PRIMITIVES_WRITTEN count
query (Model.cpp:263-272) becomes an int32 scalar carried in the pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from maskfusion_tpu.camera import CameraIntrinsics


class SurfelMap(NamedTuple):
    pos: jnp.ndarray        # (N, 3) float32 — world frame
    conf: jnp.ndarray       # (N,)   float32 — 0 marks a free slot
    color: jnp.ndarray      # (N, 3) float32 — 0..255 RGB
    init_time: jnp.ndarray  # (N,)   float32 — vColor.z
    last_seen: jnp.ndarray  # (N,)   float32 — vColor.w
    normal: jnp.ndarray     # (N, 3) float32 — world frame, unit
    radius: jnp.ndarray     # (N,)   float32
    count: jnp.ndarray      # ()     int32 — live surfels in [0, count)

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    def slot_mask(self) -> jnp.ndarray:
        idx = jax.lax.broadcasted_iota(jnp.int32, (self.capacity, 1), 0)[:, 0]
        return idx < self.count


def empty(capacity: int) -> SurfelMap:
    return SurfelMap(
        pos=jnp.zeros((capacity, 3), jnp.float32),
        conf=jnp.zeros((capacity,), jnp.float32),
        color=jnp.zeros((capacity, 3), jnp.float32),
        init_time=jnp.zeros((capacity,), jnp.float32),
        last_seen=jnp.zeros((capacity,), jnp.float32),
        normal=jnp.zeros((capacity, 3), jnp.float32),
        radius=jnp.zeros((capacity,), jnp.float32),
        count=jnp.zeros((), jnp.int32),
    )


def radius_from_depth(z: jnp.ndarray, norm_z: jnp.ndarray,
                      intr: CameraIntrinsics) -> jnp.ndarray:
    """Surfel radius (surfels.glsl getRadius:19-34): sqrt2 * z / meanFocal,
    inflated by view obliquity but capped at 2x."""
    mean_focal = (abs(intr.fx) + abs(intr.fy)) / 2.0
    r = z * (1.4142135623730951 / mean_focal)
    rn = r / jnp.maximum(jnp.abs(norm_z), 1e-6)
    return jnp.minimum(2.0 * r, rn)


def pixel_confidence(H: int, W: int, intr: CameraIntrinsics,
                     weighting) -> jnp.ndarray:
    """Radial confidence falloff (surfels.glsl confidence:36-46)."""
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    dx = u - intr.cx
    dy = v - intr.cy
    radial = jnp.sqrt(dx * dx + dy * dy) / 400.0
    return jnp.exp(-(radial * radial) / 0.72) * weighting


def init_from_frame(
    capacity: int,
    vmap_raw: jnp.ndarray,      # (H, W, 3) camera-frame vertices (raw depth)
    vmap_filt: jnp.ndarray,     # filtered-depth vertices (normal/radius source)
    nmap_filt: jnp.ndarray,
    rgb: jnp.ndarray,           # (H, W, 3) uint8
    mask: jnp.ndarray,          # (H, W) uint8
    mask_id,
    pose: jnp.ndarray,          # (4, 4) cam->world
    intr: CameraIntrinsics,
    time: float = 1.0,
) -> SurfelMap:
    """First-observation initialisation — the equivalent of
    FeedbackBuffer::computeFeedbackBuffers + Model::initialise
    (Model.cpp:240-285, vertex_feedback.vert:19-68): every valid masked pixel
    becomes a surfel."""
    H, W = vmap_raw.shape[:2]
    R = pose[:3, :3]
    t = pose[:3, 3]

    valid = (
        jnp.isfinite(vmap_raw[..., 0])
        & jnp.isfinite(nmap_filt[..., 0])
        & (vmap_raw[..., 2] > 0)
        & (mask == mask_id)
    ).reshape(-1)

    pos_w = (vmap_raw.reshape(-1, 3) @ R.T) + t
    norm_w = nmap_filt.reshape(-1, 3) @ R.T
    conf = pixel_confidence(H, W, intr, 1.0).reshape(-1)
    rad = radius_from_depth(
        vmap_filt[..., 2].reshape(-1), nmap_filt[..., 2].reshape(-1), intr
    )
    col = rgb.reshape(-1, 3).astype(jnp.float32)

    return compact_into(
        empty(capacity), valid, pos_w, conf, col,
        jnp.full((H * W,), time, jnp.float32),
        jnp.full((H * W,), time, jnp.float32),
        norm_w, rad,
    )


def compact_into(
    m: SurfelMap,
    keep: jnp.ndarray,
    pos, conf, color, init_time, last_seen, normal, radius,
) -> SurfelMap:
    """Append `keep`-masked candidate records after m.count via prefix-sum
    stream compaction (replaces transform-feedback append;
    SURVEY.md §7 decision 3).  Overflow beyond capacity is dropped."""
    n = keep.shape[0]
    cap = m.capacity
    offs = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dest = m.count + offs
    ok = keep & (dest < cap)
    dest = jnp.where(ok, dest, cap)  # scatter-drop sentinel

    def put(arr, vals):
        return arr.at[dest].set(vals.astype(arr.dtype), mode="drop")

    new_count = jnp.minimum(
        m.count + jnp.sum(keep.astype(jnp.int32)), cap
    ).astype(jnp.int32)
    return SurfelMap(
        pos=put(m.pos, pos),
        conf=put(m.conf, conf),
        color=put(m.color, color),
        init_time=put(m.init_time, init_time),
        last_seen=put(m.last_seen, last_seen),
        normal=put(m.normal, normal),
        radius=put(m.radius, radius),
        count=new_count,
    )


def compact_self(m: SurfelMap, keep: jnp.ndarray) -> SurfelMap:
    """Stream-compact the map itself (the clean pass's copy into the other
    VBO, copy_unstable.vert + Model.cpp:649-772): prefix-sum scatter into a
    fresh buffer, O(N)."""
    keep = keep & m.slot_mask()
    return compact_into(
        empty(m.capacity), keep,
        m.pos, m.conf, m.color, m.init_time, m.last_seen, m.normal, m.radius,
    )


def download(m: SurfelMap):
    """Host-side copy of live surfels (Model::downloadMap, Model.cpp:943-974)."""
    import numpy as np

    n = int(m.count)
    return {
        "pos": np.asarray(m.pos[:n]),
        "conf": np.asarray(m.conf[:n]),
        "color": np.asarray(m.color[:n]),
        "init_time": np.asarray(m.init_time[:n]),
        "last_seen": np.asarray(m.last_seen[:n]),
        "normal": np.asarray(m.normal[:n]),
        "radius": np.asarray(m.radius[:n]),
    }
