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
    conf: jnp.ndarray       # (capacity,) PRE-compaction penalised confidence
    last_seen: jnp.ndarray  # (capacity,) PRE-compaction finalised last_seen


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
    compact: bool = True,
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
    #     All 9 taps ride ONE row-gather: the 3x3 neighbourhood is
    #     pre-flattened into a (H*W, 64) f16 table by static 2D shifts (TPU
    #     row-gathers are the dominant clean cost and scale with row BYTES
    #     at this width, so the table is compressed to half precision):
    #       * z and init_time ride as f16 hi/lo pairs (hi + residual), ~21
    #         mantissa bits — reconstruction error ~2e-5 m against the
    #         reference's 0.01 m thresholds;
    #       * the winner's xy is stored as its sub-pixel RESIDUAL against
    #         (tap-pixel ray) * z — magnitude < 1 px / fx, where f16 is
    #         exact to ~1e-6 m; the absolute xy is rebuilt surfel-side from
    #         the tap pixel index;
    #       * conf>threshold and last_seen==time are single flag bits
    #         (evaluated image-side EXACTLY in f32, so no precision loss).
    #     A zero row (flag 0) marks out-of-image taps. ---
    n_px = H * W

    def hi_lo(a):
        hi = a.astype(jnp.float16)
        lo = (a - hi.astype(jnp.float32)).astype(jnp.float16)
        return hi, lo

    def split_ticks(a):
        """Integer-valued f32 ticks -> two EXACT f16 components (each an
        integer < 2048, where f16 is exact).  The naive hi/lo split
        overflows f16 to inf above 65504 ticks (~36 min at 30 FPS), turning
        the reconstruction into NaN and silently disabling the free-space
        violation test; this mod/div-2048 encoding is exact to 2048^2
        (~4.2M) ticks."""
        hi = jnp.floor(a / 2048.0)
        lo = a - hi * 2048.0
        return hi.astype(jnp.float16), lo.astype(jnp.float16)

    px_ray_x = (jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) - intr.cx) / intr.fx
    px_ray_y = (jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) - intr.cy) / intr.fy
    c_z = index_map.pos[..., 2]
    z_hi, z_lo = hi_lo(c_z)
    it_hi, it_lo = split_ticks(index_map.init_time)
    rx = (index_map.pos[..., 0] - px_ray_x * c_z).astype(jnp.float16)
    ry = (index_map.pos[..., 1] - px_ray_y * c_z).astype(jnp.float16)
    flag = (
        (index_map.index >= 0).astype(jnp.float16)
        + 2.0 * (index_map.conf > conf_threshold).astype(jnp.float16)
        + 4.0 * (index_map.last_seen == time).astype(jnp.float16)
    )
    # 8 f16 per tap (7 fields + pad) keeps every rows[:, 8k:8k+8] slice
    # LANE-ALIGNED — 7-wide slices at odd offsets forced a relayout shuffle
    # per tap that cost more than the gather itself (measured ~14 ms).
    fields = jnp.stack([z_hi, z_lo, it_hi, it_lo, rx, ry, flag,
                        jnp.zeros((H, W), jnp.float16)], axis=-1)

    taps = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            pad = [(max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx)),
                   (0, 0)]
            p = jnp.pad(fields, pad)
            taps.append(p[max(0, dy):max(0, dy) + H,
                          max(0, dx):max(0, dx) + W])
    # center extras ride the SAME gather (slots 72..74): the frame depth
    # (f16 hi+lo) and mask label that the confidence-penalty stage would
    # otherwise fetch with two extra 1-wide random gathers (~3.5 ms each)
    d_hi, d_lo = hi_lo(depth_input)
    extras = jnp.stack([
        d_hi, d_lo, mask.astype(jnp.float16),
        jnp.zeros((H, W), jnp.float16), jnp.zeros((H, W), jnp.float16),
        jnp.zeros((H, W), jnp.float16), jnp.zeros((H, W), jnp.float16),
        jnp.zeros((H, W), jnp.float16)], axis=-1)
    wide = jnp.concatenate(taps + [extras], axis=-1).reshape(n_px, 80)

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

    # ALL 9 taps evaluated as (9, N) vector ops after ONE relayout of the
    # gathered table.  The previous per-tap Python loop sliced 7 narrow
    # (N,1) columns out of the (N, 80) rows per tap — 63 lane-wasting
    # strided extractions that measured ~10x the arithmetic (~13 ms at
    # bucket 409600); a single (N, 10, 8) -> (10, 8, N) transpose makes
    # every field a contiguous (9, N) plane.
    t9 = rows.reshape(-1, 10, 8).transpose(1, 2, 0)        # (10, 8, N) f16
    c_z_s = t9[:9, 0].astype(jnp.float32) + t9[:9, 1].astype(jnp.float32)
    c_it = (t9[:9, 2].astype(jnp.float32) * 2048.0
            + t9[:9, 3].astype(jnp.float32))
    fl = t9[:9, 6].astype(jnp.int32)
    c_live = (fl & 1) > 0
    c_conf_ok = (fl & 2) > 0
    c_ls_now = (fl & 4) > 0
    dx_k = jnp.asarray([k % 3 - 1 for k in range(9)], jnp.int32)[:, None]
    dy_k = jnp.asarray([k // 3 - 1 for k in range(9)], jnp.int32)[:, None]
    # absolute winner xy from the tap pixel's ray and stored residual
    tap_x = (jnp.clip(kxi[None, :] + dx_k, 0, W - 1).astype(jnp.float32)
             - intr.cx) / intr.fx
    tap_y = (jnp.clip(kyi[None, :] + dy_k, 0, H - 1).astype(jnp.float32)
             - intr.cy) / intr.fy
    c_x = tap_x * c_z_s + t9[:9, 4].astype(jnp.float32)
    c_y = tap_y * c_z_s + t9[:9, 5].astype(jnp.float32)
    mx9 = jnp.stack([mx[k % 3] for k in range(9)])          # (9, N)
    my9 = jnp.stack([my[k // 3] for k in range(9)])
    mult = mx9 * my9

    base = in_view[None, :] & c_live & c_conf_ok & (c_z_s > lz[None, :])
    xy_dist2 = ((c_x - lp[None, :, 0]) ** 2 + (c_y - lp[None, :, 1]) ** 2)
    # integer ticks reconstruct exactly; testing against (it - 0.5) keeps
    # the strict `older than` semantics exact for all tick pairs
    c1 = base & (c_it < (m.init_time - 0.5)[None, :]) & (
        c_z_s - lz[None, :] < 0.01) & (
        xy_dist2 < (m.radius * 1.4)[None, :] ** 2)
    c2 = base & c_ls_now & (c_z_s - lz[None, :] > 0.01) & (
        (jnp.abs(ln[:, 2]) > 0.85)[None, :])
    count = jnp.sum(jnp.where(c1, mult, 0), axis=0)
    zcount = jnp.sum(jnp.where(c2, mult, 0), axis=0)

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
    # frame depth + mask at the surfel's pixel come from the wide-table
    # gather's center-extras slots (no separate 1-wide gathers)
    w_depth = (rows[:, 72].astype(jnp.float32)
               + rows[:, 73].astype(jnp.float32))
    mask_val = rows[:, 74].astype(jnp.int32)
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

    if compact:
        cleaned = SurfelMap(
            pos=m.pos, conf=conf, color=m.color, init_time=m.init_time,
            last_seen=last_seen, normal=m.normal, radius=m.radius,
            count=m.count,
        )
        out = sm.compact_self(cleaned, keep)
        removed = m.count - out.count
        return CleanResult(map=out, removed=removed, keep=keep,
                           conf=conf, last_seen=last_seen)

    # kill-in-place: culled surfels are zeroed where they stand instead of
    # stream-compacted out (the compaction sort + full-width row-gather is
    # a measurable per-frame cost; the engine runs a real compaction every
    # few frames to reclaim the holes).  A dead slot has pos=0 (fails the
    # z>0 render/projection gates), last_seen=0 (fails the resurrection and
    # activity windows), conf=0 and radius=0 (the liveness marker —
    # `radius > 0` distinguishes live slots from holes below count).
    alive = m.radius > 0
    kill = alive & jnp.logical_not(keep)
    k3 = keep[:, None]
    out = SurfelMap(
        pos=jnp.where(k3, m.pos, 0.0),
        conf=jnp.where(keep, conf, 0.0),
        color=jnp.where(k3, m.color, 0.0),
        init_time=jnp.where(keep, m.init_time, 0.0),
        last_seen=jnp.where(keep, last_seen, 0.0),
        normal=jnp.where(k3, m.normal, 0.0),
        radius=jnp.where(keep, m.radius, 0.0),
        count=m.count,
    )
    removed = jnp.sum(kill.astype(jnp.int32))
    return CleanResult(map=out, removed=removed, keep=keep,
                       conf=conf, last_seen=last_seen)


def erase_error_geometry(
    m: SurfelMap,
    mask: jnp.ndarray,          # (H, W) uint8 current segmentation
    mask_id,                    # id of the freshly spawned object model
    depth_input: jnp.ndarray,   # (H, W) filtered frame depth (0 invalid)
    pose_inv: jnp.ndarray,
    intr: CameraIntrinsics,
    depth_window: float = 0.05,
):
    """Spawn subtraction (Model::eraseErrorGeometry, Model.cpp:774-887;
    call site MaskFusion.cpp:355-358 behind enableSpawnSubtraction): when a
    new object model spawns, carve out of the GLOBAL map the surfels that
    were erroneously fused from pixels now known to belong to the object —
    i.e. surfels that project into the object's mask region at a depth
    matching the input frame.  The reference ships this disabled (its erase
    shader source was even dropped upstream); the documented semantics are
    reproduced here behind Config.spawn_subtraction.

    Returns (carved map, removed count)."""
    H, W = depth_input.shape
    R = pose_inv[:3, :3]
    t = pose_inv[:3, 3]
    lp = m.pos @ R.T + t
    lz = lp[:, 2]
    x = intr.fx * lp[:, 0] / jnp.where(lz != 0, lz, 1.0) + intr.cx
    y = intr.fy * lp[:, 1] / jnp.where(lz != 0, lz, 1.0) + intr.cy
    xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, H - 1)
    in_view = (lz > 0) & (x >= 0) & (y >= 0) & (x < W) & (y < H)

    d = depth_input[yi, xi]
    on_object = in_view & (mask[yi, xi] == jnp.asarray(mask_id, mask.dtype))
    erase = on_object & (d > 0) & (jnp.abs(lz - d) < depth_window)
    keep = m.slot_mask() & jnp.logical_not(erase)
    out = sm.compact_self(m, keep)
    return out, m.count - out.count
