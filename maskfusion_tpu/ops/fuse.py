"""Surfel fusion: per-pixel data association + weighted map update.

TPU-native replacement for the reference's two-pass transform-feedback
fusion (Model::fuse, Model.cpp:466-647):

  pass 1 (data.vert:79-194)  — for each eligible input pixel, search the
      index map around the pixel for the best matching surfel (ray-distance
      argmin under depth/normal gates); matched pixels emit an update record,
      unmatched ones a new unstable surfel.
  pass 2 (update.vert:38-111) — per surfel, blend the update record by
      confidence-weighted averaging.

Here pass 1 evaluates the reference's exact window (its 16 half-pixel taps
around a pixel-center query collapse to the 3x3 texel neighbourhood) with
static shifted slices — no gathers — and pass 2 accumulates the weighted
pixel contributions with sort-based segment sums followed by one vectorised
merge.  Where the reference's rasterised update keeps an *arbitrary* single
pixel per surfel (fragment order is unspecified), we average all matched
pixels — deterministic and strictly more information.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from maskfusion_tpu.camera import CameraIntrinsics
from maskfusion_tpu.mapping import surfel_map as sm
from maskfusion_tpu.mapping.surfel_map import SurfelMap
from maskfusion_tpu.ops.splat import IndexMap


def half_pixel_taps_unique(x: jnp.ndarray, y: jnp.ndarray):
    """The reference's association/violation window: texcoord offsets
    {-1, -0.5, 0, +0.5} pixels on each axis, sampled with nearest (floor)
    lookup (data.vert:139-161, copy_unstable.vert:87-115) — those 16
    half-pixel samples touch
    at most 3 unique texels per axis — offsets (-1, 0, +1) around floor(x)
    with per-axis multiplicities (2,2,0) when frac < 0.5 and (1,2,1)
    otherwise.  Returns 9 (ty, tx, multiplicity) taps whose
    multiplicity-weighted tests reproduce the duplicate-counted 16-tap loop
    exactly, at 9/16 the gather cost."""
    kx = jnp.floor(x).astype(jnp.int32)
    ky = jnp.floor(y).astype(jnp.int32)
    fx_lo = (x - jnp.floor(x)) < 0.5
    fy_lo = (y - jnp.floor(y)) < 0.5
    mx = [jnp.where(fx_lo, 2, 1), jnp.full_like(kx, 2), jnp.where(fx_lo, 0, 1)]
    my = [jnp.where(fy_lo, 2, 1), jnp.full_like(ky, 2), jnp.where(fy_lo, 0, 1)]
    taps = []
    for iy, dy in enumerate((-1, 0, 1)):
        for ix, dx in enumerate((-1, 0, 1)):
            taps.append((ky + dy, kx + dx, my[iy] * mx[ix]))
    return taps


def _subgrid2(a: jnp.ndarray, p: int) -> jnp.ndarray:
    """a[p::2, p::2] via a one-hot strided conv.  TPU strided slicing pays
    lane/sublane shuffles (~1 ms per VGA field, measured); the conv path is
    ~5x faster (scripts/tpu_probe_decimate.py)."""
    if a.shape[0] % 2 or a.shape[1] % 2:
        return a[p::2, p::2]
    if a.dtype == jnp.bool_:
        return _subgrid2(a.astype(jnp.float32), p) > 0.5
    if jnp.issubdtype(a.dtype, jnp.integer):
        # values in these fields stay < 2^24, exact in f32
        return _subgrid2(a.astype(jnp.float32), p).astype(a.dtype)
    if a.ndim == 2:
        x = a[None, None]
    else:
        x = a.transpose(2, 0, 1)[:, None]
    k = jnp.zeros((1, 1, 2, 2), a.dtype).at[0, 0, p, p].set(1.0)
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(2, 2), padding="VALID")
    if a.ndim == 2:
        return y[0, 0]
    return y[:, 0].transpose(1, 2, 0)


class FuseResult(NamedTuple):
    map: SurfelMap
    matched_pixels: jnp.ndarray   # (H, W) bool — merged into an existing surfel
    new_pixels: jnp.ndarray       # (H, W) bool — became new unstable surfels


def compute_fusion_weight(last_delta: jnp.ndarray, weight_multiplier) -> jnp.ndarray:
    """Velocity-adaptive fusion weight (Model::computeFusionWeight,
    Model.cpp:449-464): fast motion down-weights new measurements."""
    from maskfusion_tpu import se3

    t_norm = jnp.linalg.norm(last_delta[:3, 3])
    r_norm = jnp.linalg.norm(se3.so3_log(last_delta[:3, :3]))
    weighting = jnp.minimum(jnp.maximum(t_norm, r_norm), 0.01)
    return jnp.maximum(1.0 - weighting / 0.01, 0.5) * weight_multiplier


def fuse(
    m: SurfelMap,
    index_map: IndexMap,
    vmap_raw: jnp.ndarray,     # (H, W, 3) camera-frame vertices from raw depth
    vmap_filt: jnp.ndarray,    # filtered — normal/radius source
    nmap_filt: jnp.ndarray,
    rgb: jnp.ndarray,          # (H, W, 3) uint8
    mask: jnp.ndarray,         # (H, W) uint8
    mask_id,
    pose: jnp.ndarray,         # (4, 4) model pose (cam->world)
    intr: CameraIntrinsics,
    time,
    weighting,                 # scalar fusion weight (compute_fusion_weight * radial)
    max_depth,
    *,
    checkerboard: bool = True,
    parity: "int | None" = None,
    merge_z_thresh: float = 0.05,
    radius_merge_factor: float = 1.5,
) -> FuseResult:
    """One fusion step.  Returns the updated map (existing surfels merged AND
    new unstable surfels appended with last_seen = -2 flag, to be finalised
    by the clean pass exactly like the reference's newUnstableBuffer).

    With checkerboard subsampling, passing the frame parity as a STATIC
    `parity` lets pass 2 (sort-based segment sums + append compaction, the
    dominant fuse cost) run on the (H/2, W/2) eligible subgrid instead of
    carrying 3/4 dead rows through the sorts — the eligible pixels of
    parity p form exactly the [p::2, p::2] slice.  parity=None keeps the
    traced-parity dense path (used when `time` is not known at trace
    time)."""
    H, W = vmap_raw.shape[:2]
    # the packed tap table below carries the merge-target slot index as
    # f32 (+1) — exact only below 2^24.  Capacity is a static shape, so
    # fail at trace time rather than silently rounding slot indices and
    # fusing updates into the wrong surfels.
    if m.capacity >= (1 << 24):
        raise ValueError(
            f"surfel capacity {m.capacity} >= 2^24: the packed f32 slot "
            "lane in fuse's tap table cannot represent it exactly")
    R = pose[:3, :3]
    t = pose[:3, 3]

    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)

    z_raw = vmap_raw[..., 2]
    valid_v = jnp.isfinite(vmap_raw[..., 0]) & (z_raw > 0) & (z_raw <= max_depth)

    # 4-neighbour depth check (data.vert checkNeighbours:52-71)
    def nb(dy, dx):
        pad = jnp.pad(z_raw, 1, constant_values=0.0)
        return pad[1 + dy:1 + dy + H, 1 + dx:1 + dx + W] > 0

    neighbours_ok = nb(0, -1) & nb(0, 1) & nb(-1, 0) & nb(1, 0)

    eligible = valid_v & neighbours_ok & (mask == mask_id)
    if checkerboard and parity is None:
        tpar = jnp.mod(jnp.asarray(time, jnp.int32), 2)
        eligible = eligible & (u.astype(jnp.int32) % 2 == tpar) & (
            v.astype(jnp.int32) % 2 == tpar
        )

    # pixel ray + lambda (data.vert:131-137)
    xl = (u - intr.cx) / intr.fx
    yl = (v - intr.cy) / intr.fy
    lam = jnp.sqrt(xl * xl + yl * yl + 1.0)
    ray = jnp.stack([xl, yl, jnp.ones_like(xl)], axis=-1)

    # association search over the window.  The query coordinates are the
    # pixel CENTERS (uv = (i+0.5)/W, Model.cpp:177-183), so the reference's
    # 16 half-pixel taps (data.vert:139-161) touch exactly the 3x3 texel
    # neighbourhood — static offsets, pure shifted slices, no gathers.
    best_dist = jnp.full((H, W), 1.0e6, jnp.float32)  # squared-distance space
    best_slot = jnp.full((H, W), -1, jnp.int32)
    vnorm_l = nmap_filt

    def shift2(arr, dy, dx):
        pad = [(max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx))]
        pad += [(0, 0)] * (arr.ndim - 2)
        p = jnp.pad(arr, pad, constant_values=0)
        return p[max(0, dy):max(0, dy) + H, max(0, dx):max(0, dx) + W]

    # candidate fields packed into ONE (H, W, 8) plane: each tap is a
    # single pad+shift instead of three (9 taps x 3 separate pads was 27
    # image-size HBM round trips of relayout).  The slot index rides as f32
    # (exact to 2^24 — map capacities are <= 2^22); -1 marks dead texels
    # and pad fill 0 has pos=normal=0, which fails z_ok/norm_ok anyway but
    # the slot lane's 0 would alias slot 0, so slots are stored +1 with 0
    # meaning "none".
    packed = jnp.concatenate([
        index_map.pos,                                          # 0:3
        index_map.normal,                                       # 3:6
        jnp.stack([
            jnp.where(index_map.index >= 0,
                      index_map.index + 1, 0).astype(jnp.float32),
            jnp.zeros((H, W), jnp.float32)], axis=-1),          # 6:8
    ], axis=-1)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            tap = shift2(packed, dy, dx)
            c_pos = tap[..., 0:3]
            c_nr = tap[..., 3:6]
            slot1 = tap[..., 6]

            zdiff = c_pos[..., 2] - z_raw
            z_ok = jnp.abs(zdiff * lam) < merge_z_thresh
            # squared ray distance (argmin is monotonic in the square)
            cr = jnp.cross(ray, c_pos)
            dist2 = jnp.sum(cr * cr, axis=-1)
            # normal conformance (data.vert:150-153).  angleBetween(a,b) < 0.5
            # == cos(angle) > cos(0.5) — both normals are stored unit, so the
            # dot IS the cosine; no arccos / renormalisation needed.
            cosang = jnp.sum(c_nr * vnorm_l, axis=-1)
            norm_ok = ((jnp.abs(c_nr[..., 2]) < 0.75)
                       | (cosang > 0.8775826))
            ok = (slot1 > 0) & z_ok & norm_ok & (dist2 < best_dist)
            best_dist = jnp.where(ok, dist2, best_dist)
            best_slot = jnp.where(ok, slot1.astype(jnp.int32) - 1,
                                  best_slot)

    matched = eligible & (best_slot >= 0)
    new_pix = eligible & (best_slot < 0)

    # per-pixel measurement attributes (data.vert:88-108)
    conf_px = sm.pixel_confidence(H, W, intr, 1.0) * weighting
    rad_px = sm.radius_from_depth(vmap_filt[..., 2], nmap_filt[..., 2], intr)
    pos_w = jnp.einsum("hwi,ji->hwj", vmap_raw, R, precision="highest") + t
    norm_w = jnp.einsum("hwi,ji->hwj", nmap_filt, R, precision="highest")
    col = rgb.astype(jnp.float32)

    # ---- pass 2: per-surfel weighted sums (scatter-free segment sums:
    #      sort + cumsum + boundary diff, ops/sort_utils), then merge ----
    from maskfusion_tpu.ops import sort_utils

    cap = m.capacity
    if checkerboard and parity is not None:
        # static subgrid: only [parity::2, parity::2] pixels are eligible
        def rows(a):
            return _subgrid2(a, parity).reshape(
                (-1,) + a.shape[2:])
    else:
        def rows(a):
            return a.reshape((-1,) + a.shape[2:])

    slot_flat = rows(best_slot)
    matched_flat = rows(matched)
    a_px = rows(conf_px)

    sum_a, sum_pos, sum_col, sum_norm, sum_rad = sort_utils.segment_sum_dense(
        slot_flat, matched_flat,
        [a_px,
         rows(pos_w) * a_px[:, None],
         rows(col) * a_px[:, None],
         rows(norm_w) * a_px[:, None],
         rows(rad_px) * a_px],
        cap,
    )

    has_update = sum_a > 0
    inv_a = jnp.where(has_update, 1.0 / jnp.maximum(sum_a, 1e-20), 0.0)
    new_pos_meas = sum_pos * inv_a[:, None]
    new_col_meas = sum_col * inv_a[:, None]
    new_norm_meas = sum_norm * inv_a[:, None]
    new_rad_meas = sum_rad * inv_a

    c_k = m.conf
    tot = c_k + sum_a
    inv_tot = jnp.where(has_update, 1.0 / jnp.maximum(tot, 1e-20), 0.0)

    # radius gate (update.vert:76): only merge geometry if the measured
    # radius isn't much larger than the model's
    geom_ok = has_update & (new_rad_meas < radius_merge_factor * m.radius)

    def blend3(old, meas):
        merged = (old * c_k[:, None] + meas * sum_a[:, None]) * inv_tot[:, None]
        return jnp.where(geom_ok[:, None], merged, old)

    merged_norm = blend3(
        m.normal,
        new_norm_meas,
    )
    merged_norm = merged_norm / jnp.maximum(
        jnp.linalg.norm(merged_norm, axis=-1, keepdims=True), 1e-20
    )
    merged_rad = jnp.where(
        geom_ok, (m.radius * c_k + new_rad_meas * sum_a) * inv_tot, m.radius
    )

    updated = SurfelMap(
        pos=blend3(m.pos, new_pos_meas),
        conf=jnp.where(has_update, tot, m.conf),
        color=blend3(m.color, new_col_meas),
        init_time=m.init_time,
        last_seen=jnp.where(has_update, jnp.asarray(time, jnp.float32), m.last_seen),
        normal=merged_norm,
        radius=merged_rad,
        count=m.count,
    )

    # ---- new unstable surfels (data.geom route -> newUnstableBuffer) ----
    n_cand = rows(new_pix).shape[0]
    updated = sm.compact_into(
        updated,
        rows(new_pix),
        rows(pos_w),
        rows(conf_px),
        rows(col),
        jnp.full((n_cand,), jnp.asarray(time, jnp.float32)),
        jnp.full((n_cand,), -2.0, jnp.float32),   # vColor.w = -2 flag
        rows(norm_w),
        rows(rad_px),
    )
    if checkerboard and parity is not None:
        # dense masks for callers (subgrid row-major order == dense
        # row-major order restricted to the subgrid, so append ranks
        # computed from the dense masks stay consistent).  Iota parity
        # masking — the strided .at[...] set pays lane shuffles.
        u_i = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        v_i = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        pm = (u_i % 2 == parity) & (v_i % 2 == parity)
        matched = matched & pm
        new_pix = new_pix & pm
    return FuseResult(map=updated, matched_pixels=matched, new_pixels=new_pix)
