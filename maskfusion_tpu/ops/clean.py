"""Surfel map cleaning: outlier culling, stability timeout, mask penalties.

TPU-native replacement for the reference's copy-unstable transform-feedback
pass (copy_unstable.vert:53-160 + Model::clean, Model.cpp:649-772): every
surfel (stable + the new unstable ones appended by fuse) is tested against
the post-fuse index map and the current frame, its confidence is penalised
when its pixel's mask disagrees with its model, and survivors are
stream-compacted into a fresh buffer.  The deformation-graph application
(copy_unstable.vert:161-341) is applied separately by reloc.deformation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from maskfusion_tpu.camera import CameraIntrinsics
from maskfusion_tpu.mapping import surfel_map as sm
from maskfusion_tpu.mapping.surfel_map import SurfelMap
from maskfusion_tpu.ops.splat import IndexMap


class CleanResult(NamedTuple):
    map: SurfelMap
    removed: jnp.ndarray  # () int32 — surfels culled this pass
    keep: jnp.ndarray     # (capacity,) bool — survivors in PRE-compaction
                          # slot space (lets prediction reuse the pre-clean
                          # index map instead of a third render)


def clean(
    m: SurfelMap,
    index_map: IndexMap,
    depth_input: jnp.ndarray,   # (H, W) filtered frame depth (0 invalid)
    mask: jnp.ndarray,          # (H, W) uint8
    mask_id,
    pose_inv: jnp.ndarray,
    intr: CameraIntrinsics,
    time,
    time_delta,
    conf_threshold,
    max_depth,
    outlier_coeff,
    *,
    unstable_time_limit: float = 20.0,
    is_fern: bool = False,
) -> CleanResult:
    H, W = depth_input.shape
    R = pose_inv[:3, :3]
    t = pose_inv[:3, 3]

    lp = m.pos @ R.T + t                                  # local position
    ln = m.normal @ R.T
    ln = ln / jnp.maximum(jnp.linalg.norm(ln, axis=-1, keepdims=True), 1e-20)
    lz = lp[:, 2]
    x = intr.fx * lp[:, 0] / jnp.where(lz != 0, lz, 1.0) + intr.cx
    y = intr.fy * lp[:, 1] / jnp.where(lz != 0, lz, 1.0) + intr.cy

    time = jnp.asarray(time, jnp.float32)
    in_view = (
        ((time - m.last_seen) < time_delta)
        & (lz > 0) & (x > 0) & (y > 0) & (x < W) & (y < H)
    )

    # --- free-space violation counts over the window
    #     (copy_unstable.vert:87-115): 9 unique taps with multiplicities
    #     reproduce the reference's duplicate-counted 16 half-pixel samples.
    #     All 9 taps ride ONE 64-wide row-gather: the 3x3 neighbourhood is
    #     pre-flattened into a (H*W, 63) table by static 2D shifts (TPU
    #     row-gathers cost ~flat in row width; 9 separate 8-wide gathers were
    #     the dominant clean cost).  idx is stored +1 so the zero padding of
    #     out-of-image taps reads as invalid. ---
    n_px = H * W
    fields = jnp.concatenate([
        index_map.pos,                                        # 0:3
        index_map.conf[..., None],                            # 3
        index_map.init_time[..., None],                       # 4
        index_map.last_seen[..., None],                       # 5
        (index_map.index + 1).astype(jnp.float32)[..., None],  # 6 (0=invalid)
    ], axis=-1)                                               # (H, W, 7)
    taps = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            pad = [(max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx)),
                   (0, 0)]
            p = jnp.pad(fields, pad)
            taps.append(p[max(0, dy):max(0, dy) + H,
                          max(0, dx):max(0, dx) + W])
    wide = jnp.concatenate(
        taps + [jnp.zeros((H, W, 1), jnp.float32)], axis=-1
    ).reshape(n_px, 64)

    kx = jnp.floor(x)
    ky = jnp.floor(y)
    kxi = jnp.clip(kx.astype(jnp.int32), 0, W - 1)
    kyi = jnp.clip(ky.astype(jnp.int32), 0, H - 1)
    rows = wide[kyi * W + kxi]                                # ONE gather

    # per-axis tap multiplicities of the 16 half-pixel samples
    # (fuse.half_pixel_taps_unique): (2,2,0) when frac<0.5 else (1,2,1)
    fx_lo = (x - kx) < 0.5
    fy_lo = (y - ky) < 0.5
    mx = (jnp.where(fx_lo, 2, 1), jnp.full_like(kxi, 2),
          jnp.where(fx_lo, 0, 1))
    my = (jnp.where(fy_lo, 2, 1), jnp.full_like(kyi, 2),
          jnp.where(fy_lo, 0, 1))

    count = jnp.zeros((m.capacity,), jnp.int32)
    zcount = jnp.zeros((m.capacity,), jnp.int32)
    for k in range(9):
        r = rows[:, 7 * k:7 * k + 7]
        c_pos = r[:, 0:3]
        c_conf = r[:, 3]
        c_it = r[:, 4]
        c_ls = r[:, 5]
        c_live = r[:, 6] >= 1.0          # idx+1 > 0 and tap in-image
        mult = my[k // 3] * mx[k % 3]

        base = in_view & c_live & (c_conf > conf_threshold) & (
            c_pos[:, 2] > lz
        )
        xy_dist = jnp.linalg.norm(c_pos[:, :2] - lp[:, :2], axis=-1)
        c1 = base & (c_it < m.init_time) & (c_pos[:, 2] - lz < 0.01) & (
            xy_dist < m.radius * 1.4
        )
        c2 = base & (c_ls == time) & (c_pos[:, 2] - lz > 0.01) & (
            jnp.abs(ln[:, 2]) > 0.85
        )
        count = count + jnp.where(c1, mult, 0)
        zcount = zcount + jnp.where(c2, mult, 0)

    keep = jnp.ones((m.capacity,), bool)
    keep = keep & jnp.logical_not((count > 8) | (zcount > 4))

    # --- new unstable finalisation + stability timeout
    #     (copy_unstable.vert:130-137) ---
    last_seen = jnp.where(m.last_seen == -2.0, time, m.last_seen)
    unstable_drop = ((time - last_seen) > unstable_time_limit) & (
        m.conf < conf_threshold
    )
    keep = keep & jnp.logical_not(unstable_drop)
    # surfels outside the time window are always kept (:137)
    keep = keep | ((last_seen > 0) & ((time - last_seen) > time_delta))

    # --- mask-vs-model confidence penalty (copy_unstable.vert:150-156) ---
    xi = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 1)
    w_depth = depth_input[yi, xi]
    mask_val = mask[yi, xi].astype(jnp.int32)
    mask_id_i = jnp.asarray(mask_id, jnp.int32)
    depth_close = (w_depth > lz - 0.05) & (w_depth < lz + 0.05)
    disagree = in_view & (mask_val != mask_id_i) & (mask_val < 255) & depth_close
    soft = 0.5 + 0.5 * (1.0 - outlier_coeff / 10.0)
    penalty = jnp.where(
        mask_val == 0, soft,                       # object surfel on bg pixel
        jnp.where(mask_id_i == 0, 0.25 * soft,     # bg surfel on object pixel
                  soft),                           # inter-object
    )
    conf = jnp.where(disagree, m.conf * penalty, m.conf)

    keep = keep & m.slot_mask() & (jnp.isfinite(m.pos).all(axis=-1))

    cleaned = SurfelMap(
        pos=m.pos, conf=conf, color=m.color, init_time=m.init_time,
        last_seen=last_seen, normal=m.normal, radius=m.radius, count=m.count,
    )
    out = sm.compact_self(cleaned, keep)
    removed = m.count - out.count
    return CleanResult(map=out, removed=removed, keep=keep)
