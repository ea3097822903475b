"""Surfel rendering: index maps and view prediction.

TPU-native replacement for the reference's OpenGL rasterisation passes:

- `render_index_map` replaces the point-render of index_map.vert:38-63 /
  ModelProjection::predictIndices (ModelProjection.cpp:100-152): a two-pass
  deterministic scatter (scatter-min depth, then scatter-min surfel id among
  depth winners) instead of a z-buffered point raster.

- `combined_predict` replaces splat.vert:54-88 + combo_splat.frag:37-65
  (ModelProjection::combinedPredict, .cpp:187-268).  Instead of rasterising
  each surfel as a view-aligned disk sprite, each *pixel* gathers the index
  map in a (2r+1)^2 window and ray-disk intersects the candidate surfels —
  a dense, conflict-free formulation that maps to the VPU (SURVEY.md §7
  decision 2).  The per-pixel output (corrected vertex along the pixel ray,
  surfel normal/color/conf/time, depth) matches the fragment shader's.

- `synthesize_depth` replaces depth_splat.frag.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from maskfusion_tpu.camera import CameraIntrinsics
from maskfusion_tpu.mapping.surfel_map import SurfelMap

_NAN = jnp.nan


class IndexMap(NamedTuple):
    index: jnp.ndarray      # (H, W) int32 surfel slot, -1 = empty
    pos: jnp.ndarray        # (H, W, 3) camera-frame surfel position
    conf: jnp.ndarray       # (H, W)
    color: jnp.ndarray      # (H, W, 3)
    init_time: jnp.ndarray  # (H, W)
    last_seen: jnp.ndarray  # (H, W)
    normal: jnp.ndarray     # (H, W, 3) camera-frame surfel normal
    radius: jnp.ndarray     # (H, W)
    depth: jnp.ndarray      # (H, W) float32, inf = empty


def _project(pos_cam: jnp.ndarray, intr: CameraIntrinsics):
    z = pos_cam[:, 2]
    safe_z = jnp.where(z != 0, z, 1.0)
    u = pos_cam[:, 0] * intr.fx / safe_z + intr.cx
    v = pos_cam[:, 1] * intr.fy / safe_z + intr.cy
    return u, v, z


def render_index_map(
    m: SurfelMap,
    pose_inv: jnp.ndarray,
    intr: CameraIntrinsics,
    height: int,
    width: int,
    time,
    time_delta,
    max_depth,
    conf_threshold=None,
    max_time=None,
) -> IndexMap:
    """Single-pixel surfel render with nearest-depth visibility.

    Gates follow index_map.vert:44-49 (z in (0, maxDepth], active time
    window); `conf_threshold`/`max_time` add the splat.vert:57 gates used by
    prediction when requested."""
    cap = m.capacity
    R = pose_inv[:3, :3]
    t = pose_inv[:3, 3]
    p_cam = m.pos @ R.T + t
    n_cam = m.normal @ R.T

    u, v, z = _project(p_cam, intr)
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)

    live = m.slot_mask()
    active = (time - m.last_seen) <= time_delta
    ok = (
        live & active & (z > 0) & (z <= max_depth)
        & (ui >= 0) & (ui < width) & (vi >= 0) & (vi < height)
    )
    if conf_threshold is not None:
        ok = ok & (m.conf >= conf_threshold)
    if max_time is not None:
        ok = ok & (m.last_seen <= max_time)

    lin = vi * width + ui

    # scatter-free z-buffer: lexicographic sort + first-of-segment lookup
    # (ops/sort_utils.zbuffer_render; ties break to the lowest slot)
    from maskfusion_tpu.ops import sort_utils

    idx, win_z = sort_utils.zbuffer_render(lin, z, ok, height * width)
    empty = idx < 0
    safe = jnp.where(empty, 0, idx)

    # one packed row-gather for all winner fields
    packed, slices = sort_utils.pack_columns(
        [p_cam, m.conf, m.color, m.init_time, m.last_seen, n_cam, m.radius])
    rows = jnp.where(empty[:, None], 0.0, packed[safe])
    pos_w, conf_w, col_w, it_w, ls_w, n_w, rad_w = sort_utils.unpack_columns(
        rows, slices)

    def im2(a):
        return a.reshape(height, width)

    def im3(a):
        return a.reshape(height, width, a.shape[1])

    return IndexMap(
        index=idx.reshape(height, width),
        pos=im3(pos_w),
        conf=im2(conf_w),
        color=im3(col_w),
        init_time=im2(it_w),
        last_seen=im2(ls_w),
        normal=im3(n_w),
        radius=im2(rad_w),
        depth=win_z.reshape(height, width),
    )


def pack_index_fields(im: IndexMap) -> jnp.ndarray:
    """(H*W, 12) row table [pos(3), normal(3), conf, radius, init_time,
    last_seen, slot_index, pad] so window sampling costs ONE row-gather per
    tap instead of six scalar gathers (TPU random gathers are slow; rows
    amortise).  The slot index rides as float32 — exact up to 2^24, far
    above any surfel capacity in use."""
    H, W = im.index.shape
    n = H * W
    return jnp.concatenate([
        im.pos.reshape(n, 3),
        im.normal.reshape(n, 3),
        im.conf.reshape(n, 1),
        im.radius.reshape(n, 1),
        im.init_time.reshape(n, 1),
        im.last_seen.reshape(n, 1),
        im.index.reshape(n, 1).astype(jnp.float32),
        jnp.zeros((n, 1), jnp.float32),
    ], axis=1)


def patch_index_map(
    im1: IndexMap,
    m: SurfelMap,             # POST-fuse map (updated fields + appends)
    new_pix: jnp.ndarray,     # (H, W) bool — pixels that appended unstables
    vmap_raw: jnp.ndarray,    # (H, W, 3) camera-frame vertices (new pos)
    nmap_filt: jnp.ndarray,   # (H, W, 3) camera-frame normals
    conf_px: jnp.ndarray,     # (H, W) per-pixel confidence * weighting
    rgb: jnp.ndarray,         # (H, W, 3)
    rad_px: jnp.ndarray,      # (H, W)
    pose_inv: jnp.ndarray,
    time,
    count_before: jnp.ndarray,
) -> IndexMap:
    """Incremental post-fuse index map — replaces the second full render of
    the reference's schedule (predictIndices -> fuse -> predictIndices,
    MaskFusion.cpp:541-561) with two dense passes:

      1. REFRESH: every im1 winner's fields are re-fetched from the
         post-fuse map (one (H*W)-row gather) — merged surfels' updated
         position/confidence/last_seen appear exactly.
      2. INSERT: each appended unstable lands at its own pixel (fuse's
         association already searched that pixel's neighbourhood and found
         nothing), z-tested against the refreshed winner.  Slot ids follow
         compact_into's append order (row-major rank over new_pix).

    The only deviation from a true re-render: an existing surfel whose
    BLENDED position crosses a pixel boundary keeps its im1 pixel for this
    frame's clean/predict (sub-pixel per frame; next frame's im1 render is
    exact).  Saves a bucket+HW-row sort render per frame."""
    H, W = new_pix.shape
    from maskfusion_tpu.ops import sort_utils

    R = pose_inv[:3, :3]
    t = pose_inv[:3, 3]
    idx = im1.index
    empty = idx < 0
    safe = jnp.where(empty, 0, idx).reshape(-1)

    p_cam_all = m.pos @ R.T + t
    n_cam_all = m.normal @ R.T
    packed, slices = sort_utils.pack_columns(
        [p_cam_all, m.conf, m.color, m.init_time, m.last_seen, n_cam_all,
         m.radius])
    rows = jnp.where(empty.reshape(-1)[:, None], 0.0, packed[safe])
    pos_w, conf_w, col_w, it_w, ls_w, n_w, rad_w = sort_utils.unpack_columns(
        rows, slices)

    def im2d(a):
        return a.reshape(H, W)

    def im3d(a):
        return a.reshape(H, W, a.shape[1])

    r_pos = im3d(pos_w)
    r_depth = jnp.where(empty, jnp.inf, r_pos[..., 2])

    # appended unstables: rank in dense row-major order == compact order
    rank = jnp.cumsum(new_pix.reshape(-1).astype(jnp.int32)).reshape(H, W)
    slot_new = count_before + rank - 1
    cap = m.capacity
    valid_new = new_pix & (slot_new < cap)
    z_new = vmap_raw[..., 2]
    take_new = valid_new & (z_new > 0) & (z_new < r_depth)

    tk3 = take_new[..., None]
    time_f = jnp.asarray(time, jnp.float32)
    return IndexMap(
        index=jnp.where(take_new, slot_new,
                        jnp.where(empty, -1, idx)),
        pos=jnp.where(tk3, vmap_raw, r_pos),
        conf=jnp.where(take_new, conf_px, im2d(conf_w)),
        color=jnp.where(tk3, rgb.astype(jnp.float32), im3d(col_w)),
        init_time=jnp.where(take_new, time_f, im2d(it_w)),
        last_seen=jnp.where(take_new, -2.0, im2d(ls_w)),
        normal=jnp.where(tk3, nmap_filt, im3d(n_w)),
        radius=jnp.where(take_new, rad_px, im2d(rad_w)),
        depth=jnp.where(take_new, z_new, r_depth),
    )


class Prediction(NamedTuple):
    vmap: jnp.ndarray    # (H, W, 3) camera-frame corrected vertices, NaN holes
    nmap: jnp.ndarray    # (H, W, 3)
    rgb: jnp.ndarray     # (H, W, 3) float32 0..255
    conf: jnp.ndarray    # (H, W)
    time: jnp.ndarray    # (H, W) surfel init_time (combo_splat writes colTime.z)
    depth: jnp.ndarray   # (H, W) 0 = hole


def combined_predict(
    index_map: IndexMap,
    intr: CameraIntrinsics,
    max_depth,
    window: int = 2,
    coarse: "tuple[IndexMap, int] | None" = None,
    pallas: bool = False,
    pallas_interpret: bool = False,
) -> Prediction:
    """Per-pixel gather splatting over the index map.

    For every pixel ray l, each candidate surfel (p, n, rad) in the window
    contributes the ray-disk intersection z* = (p.n)/(l.n) if the hit lies
    within rad of p (combo_splat.frag:37-58); the nearest z* wins.

    The reference rasterises each surfel as a sprite sized by its PROJECTED
    radius (splat.vert:54-88), so a surfel fused at 4 m and revisited at
    0.5 m fills ~+-11 px.  A fixed gather window cannot afford that many
    taps; `coarse` supplies a second index map rendered at 1/2**k
    resolution (a z-buffer render is ~2 ms — far cheaper than pooling the
    full-res map, whose strided 2x2 decimation dominated an earlier
    design).  Candidate SELECTION over the coarse map runs at the coarse
    grid with texel rays; the winner under each full-res pixel is then
    re-validated with the TRUE pixel ray via one row-gather, so the
    hierarchy affects only which candidates are considered, never the
    geometry of a hit.  A +-window tap pattern at factor 2**k reaches
    +-(window + 0.5) * 2**k px of footprint.
    """
    H, W = index_map.index.shape
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    # combo_splat uses gl_FragCoord (pixel centers); our index map projects
    # to rounded pixel positions, so the integer pixel grid is the ray grid.
    lx = (u - intr.cx) / intr.fx
    ly = (v - intr.cy) / intr.fy
    lnorm = jnp.sqrt(lx * lx + ly * ly + 1.0)
    l = jnp.stack([lx / lnorm, ly / lnorm, 1.0 / lnorm], axis=-1)

    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    def shift2(arr, dy, dx, fill):
        h, w = arr.shape[:2]
        pad = [(max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx))]
        pad += [(0, 0)] * (arr.ndim - 2)
        p = jnp.pad(arr, pad, constant_values=fill)
        return p[max(0, dy):max(0, dy) + h, max(0, dx):max(0, dx) + w]

    # ---- level-0 scan: exact per-pixel rays over the +-window taps ----
    # phase 1 tracks only (best_z, best_src): the winning candidate's row
    # in the concatenated field tables.  Everything else about the winner
    # (normal/color/conf/time) is fetched afterwards with ONE packed
    # row-gather — tracking fields through every tap's select was ~3x the
    # arithmetic for no information gain.
    if pallas:
        # row-tiled VMEM-resident scan: the XLA lowering below pays ~25
        # image-size HBM round trips of tap relayout (13.4 ms in-context
        # at VGA); the Pallas kernel pays one.
        from maskfusion_tpu.ops import pallas_kernels

        best_z, best_srcf = pallas_kernels.predict_l0_scan_pallas(
            index_map.pos, index_map.normal, index_map.radius,
            index_map.index >= 0,
            intr.fx, intr.fy, intr.cx, intr.cy,
            max_depth, window=window, interpret=pallas_interpret)
        best_src = best_srcf.astype(jnp.int32)
    else:
        best_z = jnp.full((H, W), jnp.inf, jnp.float32)
        best_src = jnp.full((H, W), -1, jnp.int32)

        # The per-candidate fields are PACKED into one (H, W, 8) plane so
        # each tap is ONE pad+shift instead of four (25 taps x 4 separate
        # pads was ~100 image-size HBM round trips).
        packed0 = jnp.concatenate([
            index_map.pos,                                             # 0:3
            index_map.normal,                                          # 3:6
            jnp.stack([index_map.radius,
                       (index_map.index >= 0).astype(jnp.float32)],
                      axis=-1),                                        # 6:8
        ], axis=-1)
        for dy in range(-window, window + 1):
            for dx in range(-window, window + 1):
                t = shift2(packed0, dy, dx, 0.0)
                cp = t[..., 0:3]
                cn = t[..., 3:6]
                crad = t[..., 6]
                live = t[..., 7] > 0

                denom = jnp.sum(l * cn, axis=-1)
                z_star = jnp.sum(cp * cn, axis=-1) / jnp.where(
                    jnp.abs(denom) > 1e-12, denom, 1e-12
                )
                hit = l * z_star[..., None]
                z_cam = hit[..., 2]
                miss2 = jnp.sum((hit - cp) ** 2, axis=-1)
                ok = (
                    live
                    & (miss2 <= crad * crad)
                    & (z_cam > 0)
                    & (z_cam <= max_depth)
                    & (z_cam < best_z)
                )
                best_z = jnp.where(ok, z_cam, best_z)
                src = (jnp.clip(yy + dy, 0, H - 1) * W
                       + jnp.clip(xx + dx, 0, W - 1))
                best_src = jnp.where(ok, src, best_src)

    tables = [index_map]
    if coarse is not None:
        cim, klog = coarse
        tables.append(cim)
        factor = 1 << klog
        cintr = intr.level(klog)
        ch, cw = cim.index.shape
        cxx = jax.lax.broadcasted_iota(jnp.float32, (ch, cw), 1)
        cyy = jax.lax.broadcasted_iota(jnp.float32, (ch, cw), 0)
        clx = (cxx - cintr.cx) / cintr.fx
        cly = (cyy - cintr.cy) / cintr.fy
        cln = jnp.sqrt(clx * clx + cly * cly + 1.0)
        cl = jnp.stack([clx / cln, cly / cln, 1.0 / cln], axis=-1)

        cz = jnp.full((ch, cw), jnp.inf, jnp.float32)
        csrc = jnp.full((ch, cw), -1, jnp.int32)
        cyy_i = jax.lax.broadcasted_iota(jnp.int32, (ch, cw), 0)
        cxx_i = jax.lax.broadcasted_iota(jnp.int32, (ch, cw), 1)
        packedc = jnp.concatenate([
            cim.pos, cim.normal,
            jnp.stack([cim.radius,
                       (cim.index >= 0).astype(jnp.float32)], axis=-1),
        ], axis=-1)
        for dy in range(-window, window + 1):
            for dx in range(-window, window + 1):
                t = shift2(packedc, dy, dx, 0.0)
                cp = t[..., 0:3]
                cn = t[..., 3:6]
                crad = t[..., 6]
                live = t[..., 7] > 0
                denom = jnp.sum(cl * cn, axis=-1)
                z_star = jnp.sum(cp * cn, axis=-1) / jnp.where(
                    jnp.abs(denom) > 1e-12, denom, 1e-12)
                hit = cl * z_star[..., None]
                z_cam = hit[..., 2]
                miss2 = jnp.sum((hit - cp) ** 2, axis=-1)
                # selection gate: generous radius (the coarse texel ray is
                # up to one texel off the true pixel ray)
                slack = crad + factor * z_cam / abs(intr.fx)
                # rank by 5 cm depth band, then by ray-miss distance —
                # a pure z-min breaks ties by tap order and can keep a
                # far-corner candidate whose disk misses half the texel
                score = (jnp.floor(z_cam * 20.0) * 1e3
                         + miss2 / jnp.maximum(slack * slack, 1e-12))
                ok = (
                    live
                    & (miss2 <= slack * slack)
                    & (z_cam > 0)
                    & (z_cam <= max_depth)
                    & (score < cz)
                )
                cz = jnp.where(ok, score, cz)
                src = (H * W
                       + jnp.clip(cyy_i + dy, 0, ch - 1) * cw
                       + jnp.clip(cxx_i + dx, 0, cw - 1))
                csrc = jnp.where(ok, src, csrc)

        # exact re-validation under every full-res pixel: one 1-wide src
        # gather + one packed geometry row-gather, then the true-ray test
        geom = jnp.concatenate([
            jnp.concatenate([
                t.pos.reshape(-1, 3),
                t.normal.reshape(-1, 3),
                t.radius.reshape(-1, 1),
            ], axis=1)
            for t in tables
        ], axis=0)
        lin = ((yy >> klog) * cw + (xx >> klog)).reshape(-1)
        src = csrc.reshape(-1)[lin]
        rows = geom[jnp.clip(src, 0)]
        valid = (src >= 0).reshape(H, W)
        cp = rows[:, 0:3].reshape(H, W, 3)
        cn = rows[:, 3:6].reshape(H, W, 3)
        crad = rows[:, 6].reshape(H, W)
        denom = jnp.sum(l * cn, axis=-1)
        z_star = jnp.sum(cp * cn, axis=-1) / jnp.where(
            jnp.abs(denom) > 1e-12, denom, 1e-12)
        hit = l * z_star[..., None]
        z_cam = hit[..., 2]
        miss2 = jnp.sum((hit - cp) ** 2, axis=-1)
        ok = (
            valid
            & (miss2 <= crad * crad)
            & (z_cam > 0)
            & (z_cam <= max_depth)
            & (z_cam < best_z)
        )
        best_z = jnp.where(ok, z_cam, best_z)
        best_src = jnp.where(ok, src.reshape(H, W), best_src)

    # phase 2: fetch the winner's normal + appearance attributes in one
    # packed row-gather over the concatenated tables
    attr = jnp.concatenate([
        jnp.concatenate([
            t.normal.reshape(-1, 3),
            t.color.reshape(-1, 3),
            t.conf.reshape(-1, 1),
            t.init_time.reshape(-1, 1),
        ], axis=1)
        for t in tables
    ], axis=0)
    rows = attr[jnp.clip(best_src.reshape(-1), 0)]
    found = best_src.reshape(-1) >= 0
    rows = jnp.where(found[:, None], rows, 0.0)
    best_normal = rows[:, 0:3].reshape(H, W, 3)
    color = rows[:, 3:6].reshape(H, W, 3)
    conf = rows[:, 6].reshape(H, W)
    time_w = rows[:, 7].reshape(H, W)

    holes = jnp.isinf(best_z)
    hit_pos = l * jnp.where(holes, 0.0, best_z)[..., None] / l[..., 2:3]
    vmap = jnp.where(holes[..., None], _NAN, hit_pos)
    nmap = jnp.where(holes[..., None], _NAN, best_normal)
    depth = jnp.where(holes, 0.0, best_z)
    return Prediction(
        vmap=vmap,
        nmap=nmap,
        rgb=color,
        conf=jnp.where(holes, 0.0, conf),
        time=time_w,
        depth=depth,
    )


def synthesize_depth(pred: Prediction) -> jnp.ndarray:
    """Depth-only output (ModelProjection::synthesizeDepth, depth_splat.frag)."""
    return pred.depth


