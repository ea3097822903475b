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
    # several hot paths route surfel slot indices through f32 (fuse's
    # _subgrid2 one-hot conv, splat.pack_index_fields), which is exact only
    # below 2^24; beyond that slot ids would silently round and merge pixel
    # updates into wrong surfels.  The reference default (9.44M) fits.
    if capacity >= 1 << 24:
        raise ValueError(
            f"surfel capacity {capacity} >= 2^24 would break f32-exact "
            "slot-index routing (ops/fuse._subgrid2, splat.pack_index_fields)")
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
    weighting: float = 1.0,
) -> SurfelMap:
    """First-observation initialisation — the equivalent of
    FeedbackBuffer::computeFeedbackBuffers + Model::initialise
    (Model.cpp:240-285, vertex_feedback.vert:19-68): every valid masked pixel
    becomes a surfel.

    `weighting` scales the initial confidences (object-model spawns pass the
    first-fuse boost so the newborn map clears GlobalProjection's hardcoded
    conf-12 gate, GlobalProjection.cpp:61, on its very first projection —
    the async pipeline can't rely on a same-frame fuse to do it)."""
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
    conf = pixel_confidence(H, W, intr, 1.0).reshape(-1) * weighting
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
    """Append `keep`-masked candidate records after m.count (replaces
    transform-feedback append; SURVEY.md §7 decision 3).  Scatter-free:
    stable-sort compaction of the candidates + a two-gather merge (XLA's TPU
    scatter serialises per element — see ops/sort_utils).  Overflow beyond
    capacity is dropped."""
    from maskfusion_tpu.ops import sort_utils

    cap = m.capacity
    P = keep.shape[0]
    compacted, n_new = sort_utils.compact(
        keep,
        [pos.astype(jnp.float32), conf.astype(jnp.float32),
         color.astype(jnp.float32), init_time.astype(jnp.float32),
         last_seen.astype(jnp.float32), normal.astype(jnp.float32),
         radius.astype(jnp.float32)],
    )
    packed, slices = sort_utils.pack_columns(compacted)
    new_count = jnp.minimum(m.count + n_new, cap).astype(jnp.int32)

    if P >= cap:
        # the append window covers the whole map: full-width merge
        slot = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)[:, 0]
        take_new = (slot >= m.count) & (slot < new_count)
        src = jnp.clip(slot - m.count, 0, P - 1)
        grows = packed[src]
        cols = sort_utils.unpack_columns(grows, slices)

        def merge(old, new):
            mask = take_new if old.ndim == 1 else take_new[:, None]
            return jnp.where(mask, new.astype(old.dtype), old)
    else:
        # the appended region is a CONTIGUOUS P-row window at m.count —
        # write it with dynamic_slice/update_slice instead of the previous
        # capacity-wide row-gather + full-map select (a cap-row gather costs
        # ~ms at bucket sizes; the window ops are dense and P-sized).  Near
        # capacity the window is clamped to [cap-P, cap) and the candidates
        # shifted to their true slots; overflow rows fall off the end
        # exactly like the old clamp.
        offset = jnp.minimum(m.count, cap - P)
        shift = m.count - offset                      # in [0, P]
        padded = jnp.concatenate(
            [jnp.zeros_like(packed), packed], axis=0)
        window_cand = jax.lax.dynamic_slice(
            padded, (P - shift, 0), (P, packed.shape[1]))
        widx = offset + jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)[:, 0]
        take_new = (widx >= m.count) & (widx < new_count)
        cols = sort_utils.unpack_columns(window_cand, slices)

        def merge(old, new):
            sizes = (P,) + old.shape[1:]
            starts = (offset,) + (0,) * (old.ndim - 1)
            w_old = jax.lax.dynamic_slice(old, starts, sizes)
            mask = take_new if old.ndim == 1 else take_new[:, None]
            w = jnp.where(mask, new.astype(old.dtype), w_old)
            return jax.lax.dynamic_update_slice(old, w, starts)

    cpos, cconf, ccol, cit, cls_, cnorm, crad = cols
    return SurfelMap(
        pos=merge(m.pos, cpos),
        conf=merge(m.conf, cconf),
        color=merge(m.color, ccol),
        init_time=merge(m.init_time, cit),
        last_seen=merge(m.last_seen, cls_),
        normal=merge(m.normal, cnorm),
        radius=merge(m.radius, crad),
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


def prefix_view(m: SurfelMap, bucket: int) -> SurfelMap:
    """Static-shape prefix of the live region.  Surfels are kept compacted in
    [0, count), so all per-surfel passes can run on a power-of-two bucket
    >= count instead of the full capacity — the active-window compaction
    strategy from SURVEY.md §5.7.  `bucket` must be static."""
    if bucket >= m.capacity:
        return m
    return SurfelMap(
        pos=m.pos[:bucket], conf=m.conf[:bucket], color=m.color[:bucket],
        init_time=m.init_time[:bucket], last_seen=m.last_seen[:bucket],
        normal=m.normal[:bucket], radius=m.radius[:bucket], count=m.count,
    )


def write_back(full: SurfelMap, pref: SurfelMap) -> SurfelMap:
    """Merge a processed prefix back into the full-capacity buffers
    (contiguous static-offset update; slots beyond the bucket are zeros by
    the compaction invariant)."""
    if pref.capacity >= full.capacity:
        return pref

    def put(f, p):
        return jax.lax.dynamic_update_slice(
            f, p.astype(f.dtype), (0,) * f.ndim)

    return SurfelMap(
        pos=put(full.pos, pref.pos), conf=put(full.conf, pref.conf),
        color=put(full.color, pref.color),
        init_time=put(full.init_time, pref.init_time),
        last_seen=put(full.last_seen, pref.last_seen),
        normal=put(full.normal, pref.normal),
        radius=put(full.radius, pref.radius),
        count=pref.count,
    )


def choose_bucket(count: int, capacity: int, headroom: int = 81920,
                  minimum: int = 1 << 18, current: int = 0,
                  pow2_steps: bool = False) -> int:
    """Host-side bucket policy: smallest 1.25x-step bucket covering count
    plus one frame's worth of appends (checkerboard fusion appends at most
    H*W/4 = 76800 new unstables per frame at VGA).  Quarter-octave steps
    instead of power-of-two halve the average dead-row waste in the
    bucket-sized sorts/gathers (the dominant per-frame costs scale with
    bucket, not count) at the price of ~2x more distinct compiled variants
    over a map's lifetime — amortised by the persistent compile cache.
    Passing the model's `current` bucket adds shrink hysteresis so a count
    hovering at a step boundary doesn't flip-flop between two compiled
    variants every few frames."""
    need = max(int(count) + headroom, minimum)
    b = minimum
    while b < need:
        # pow2 steps halve the number of distinct compiled variants a
        # growing map walks through — used for object models, whose jitted
        # stages recompile per (bucket, n_objects) combination
        b += b if pow2_steps else b >> 2
    b = min(b, capacity)
    if current and b < current <= capacity and need > int(current * 0.7):
        return current
    return b


def download(m: SurfelMap):
    """Host-side copy of live surfels (Model::downloadMap, Model.cpp:943-974).

    Skips killed-in-place holes (radius == 0 below count — the kill marker
    of clean(compact=False)); a no-op on freshly compacted maps."""
    import numpy as np

    n = int(m.count)
    radius = np.asarray(m.radius[:n])
    live = radius > 0
    return {
        "pos": np.asarray(m.pos[:n])[live],
        "conf": np.asarray(m.conf[:n])[live],
        "color": np.asarray(m.color[:n])[live],
        "init_time": np.asarray(m.init_time[:n])[live],
        "last_seen": np.asarray(m.last_seen[:n])[live],
        "normal": np.asarray(m.normal[:n])[live],
        "radius": radius[live],
    }
