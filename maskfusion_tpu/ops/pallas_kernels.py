"""Pallas TPU kernels for the dense stencil ops.

Row-tiled stencil pattern: the grid walks row-bands; each program sees three
consecutive bands (prev / curr / next) of every input plane via shifted
BlockSpec index maps and reconstructs its halo with two concatenations —
overlapping halos without element-offset block maps, with VMEM usage bounded
by the band height instead of the whole image (whole-image VMEM residency
OOMs the 16 MB scoped limit at 640x480 x 6 planes).

  bilateral_filter_depth_pallas — (2R+1)^2 range-weighted depth filter
      (ref depth_bilateral_metric.frag:31-76)
  geometric_edge_map_pallas     — 8-neighbourhood concavity/discontinuity
      stencil (ref segmentation.cu:122-177)

`dispatch.use_pallas()` picks these on TPU; the jnp implementations remain
the reference semantics and the CPU/test path (interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only module; absent on CPU-only installs
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _tiled_stencil_multi(kernel_tile, planes, H, W, halo, band, n_pad_cols,
                         fill, interpret, n_out=1, scalars=None):
    """Run kernel_tile(tile_list, out_block_list, *scalar_refs) over row
    bands.

    planes: list of (H, W) arrays.  Each is padded to
    (band + Hp + band, Wp) with `fill`; the grid program i reads bands
    i, i+1, i+2 (prev/curr/next) per plane and writes out band i of each
    of the `n_out` f32 outputs.  scalars: optional list of small (1, K)
    f32 arrays placed in SMEM (runtime parameters, e.g. intrinsics)."""
    Hp = _round_up(H, band)
    Wp = _round_up(W + 2 * n_pad_cols, 128)
    rows = band + Hp + band
    padded = []
    for p in planes:
        buf = jnp.full((rows, Wp), fill, jnp.float32)
        buf = jax.lax.dynamic_update_slice(
            buf, p.astype(jnp.float32), (band, n_pad_cols))
        padded.append(buf)

    n_bands = Hp // band
    n_planes = len(planes)
    scalars = scalars or []
    n_scal = len(scalars)

    def kernel(*refs):
        scal_refs = refs[:n_scal]
        in_refs = refs[n_scal:len(refs) - n_out]
        out_refs = refs[len(refs) - n_out:]
        tiles = []
        for pi in range(n_planes):
            prev = in_refs[pi * 3 + 0]
            curr = in_refs[pi * 3 + 1]
            nxt = in_refs[pi * 3 + 2]
            tiles.append(jnp.concatenate(
                [prev[band - halo:band, :], curr[:, :], nxt[:halo, :]],
                axis=0))
        kernel_tile(tiles, list(out_refs), *scal_refs)

    compiled = _VMEM is not None and not interpret
    vmem = {"memory_space": _VMEM} if compiled else {}
    smem = {"memory_space": pltpu.SMEM} if compiled else {}
    in_specs = [pl.BlockSpec(s.shape, lambda i: (0, 0), **smem)
                for s in scalars]
    for _ in range(n_planes):
        for off in (0, 1, 2):
            in_specs.append(pl.BlockSpec(
                (band, Wp), lambda i, off=off: (i + off, 0), **vmem))
    out_specs = [pl.BlockSpec((band, Wp), lambda i: (i, 0), **vmem)
                 for _ in range(n_out)]
    out_shapes = [jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)
                  for _ in range(n_out)]

    outs = pl.pallas_call(
        kernel,
        grid=(n_bands,),
        in_specs=in_specs,
        out_specs=out_specs if n_out > 1 else out_specs[0],
        out_shape=out_shapes if n_out > 1 else out_shapes[0],
        interpret=interpret,
    )(*([jnp.asarray(s, jnp.float32) for s in scalars]
        + [p for p in padded for _ in range(3)]))
    if n_out == 1:
        outs = (outs,)
    return tuple(o[:H, n_pad_cols:n_pad_cols + W] for o in outs)


def _tiled_stencil(kernel_tile, planes, H, W, halo, band, n_pad_cols,
                   fill, interpret):
    """Single-output wrapper of _tiled_stencil_multi (original API)."""
    def tile_one(tiles, out_refs):
        kernel_tile(tiles, out_refs[0])

    return _tiled_stencil_multi(tile_one, planes, H, W, halo, band,
                                n_pad_cols, fill, interpret, n_out=1)[0]


# ---------------------------------------------------------------------------
# bilateral depth filter
# ---------------------------------------------------------------------------

def bilateral_filter_depth_pallas(
    depth: jnp.ndarray,
    radius: int = 6,
    sigma_space2_inv_half: float = 0.024691358,
    sigma_color2_inv_half: float = 555.556,
    min_valid_depth: float = 0.03,
    band: int = 24,
    interpret: bool = False,
) -> jnp.ndarray:
    H, W = depth.shape

    def tile_kernel(tiles, out_ref):
        img = tiles[0]                       # (band + 2R, Wp)
        bh = img.shape[0] - 2 * radius
        wp = img.shape[1]
        center = img[radius:radius + bh, :]
        sum1 = jnp.zeros((bh, wp), jnp.float32)
        sum2 = jnp.zeros((bh, wp), jnp.float32)
        for dy in range(-radius, radius + 1):
            row = img[radius + dy:radius + dy + bh, :]
            for dx in range(-radius, radius + 1):
                if dx == 0:
                    nb = row
                elif _VMEM is not None and not interpret:
                    # pltpu.roll wants a non-negative shift
                    nb = pltpu.roll(row, (-dx) % row.shape[1], 1)
                else:
                    nb = jnp.roll(row, -dx, 1)
                space2 = float(dy * dy + dx * dx)
                color2 = (center - nb) ** 2
                w = jnp.exp(-(space2 * sigma_space2_inv_half
                              + color2 * sigma_color2_inv_half))
                ok = jnp.isfinite(nb)
                sum1 = sum1 + jnp.where(ok, nb * w, 0.0)
                sum2 = sum2 + jnp.where(ok, w, 0.0)
        out = sum1 / jnp.maximum(sum2, 1e-20)
        out_ref[:, :] = jnp.where(center <= min_valid_depth, 0.0, out)

    return _tiled_stencil(tile_kernel, [depth], H, W, halo=radius, band=band,
                          n_pad_cols=radius, fill=jnp.inf,
                          interpret=interpret)


# ---------------------------------------------------------------------------
# geometric edge map
# ---------------------------------------------------------------------------

_OFFS8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def geometric_edge_map_pallas(
    vmap: jnp.ndarray,
    nmap: jnp.ndarray,
    weight_distance: float,
    weight_concavity: float,
    band: int = 40,
    interpret: bool = False,
) -> jnp.ndarray:
    H, W = vmap.shape[:2]

    def tile_kernel(tiles, out_ref):
        bh = tiles[0].shape[0] - 2
        wp = tiles[0].shape[1]

        def center(t):
            return t[1:1 + bh, :]

        def shifted(t, dy, dx):
            rows = t[1 + dy:1 + dy + bh, :]
            if dx == 0:
                return rows
            if _VMEM is not None and not interpret:
                return pltpu.roll(rows, (-dx) % rows.shape[1], 1)
            return jnp.roll(rows, -dx, 1)

        vx, vy, vz = (center(tiles[i]) for i in range(3))
        nx, ny, nz = (center(tiles[i]) for i in range(3, 6))
        c_term = jnp.zeros((bh, wp), jnp.float32)
        d_term = jnp.zeros((bh, wp), jnp.float32)
        for dy, dx in _OFFS8:
            dvx = shifted(tiles[0], dy, dx) - vx
            dvy = shifted(tiles[1], dy, dx) - vy
            dvz = shifted(tiles[2], dy, dx) - vz
            side = dvx * nx + dvy * ny + dvz * nz
            conc = 1.0 - (shifted(tiles[3], dy, dx) * nx
                          + shifted(tiles[4], dy, dx) * ny
                          + shifted(tiles[5], dy, dx) * nz)
            conc = jnp.where(side < 0, 0.0, conc)
            c_term = jnp.maximum(c_term, jnp.nan_to_num(conc, nan=0.0))
            d_term = jnp.maximum(d_term, jnp.nan_to_num(jnp.abs(side),
                                                        nan=0.0))
        edge = jnp.minimum(1.0, jnp.maximum(c_term * weight_concavity,
                                            d_term * weight_distance))
        invalid = jnp.logical_not(jnp.isfinite(vx)) | (vz <= 0.0)
        out_ref[:, :] = jnp.where(invalid, 1.0, edge)

    planes = [vmap[..., i] for i in range(3)] + [nmap[..., i] for i in range(3)]
    out = _tiled_stencil(tile_kernel, planes, H, W, halo=1, band=band,
                         n_pad_cols=1, fill=jnp.nan, interpret=interpret)
    # border pixels are always edges (segmentation.cu:132-136)
    out = out.at[0, :].set(1.0).at[H - 1, :].set(1.0)
    out = out.at[:, 0].set(1.0).at[:, W - 1].set(1.0)
    return out


# ---------------------------------------------------------------------------
# prediction: level-0 ray-disk gather scan
# ---------------------------------------------------------------------------

def predict_l0_scan_pallas(
    pos: jnp.ndarray,        # (H, W, 3) index-map surfel positions
    normal: jnp.ndarray,     # (H, W, 3)
    radius: jnp.ndarray,     # (H, W)
    live: jnp.ndarray,       # (H, W) bool/float: slot occupied
    fx, fy, cx, cy,          # intrinsics — floats OR traced scalars (the
                             # windowed object path shifts cx/cy at runtime)
    max_depth,
    window: int = 2,
    band: int = 24,
    interpret: bool = False,
):
    """Winner scan of `ops/splat.combined_predict`'s level-0 tap loop
    (combo_splat.frag:37-58 ray-disk intersection, nearest-z winner).

    The XLA lowering of the 25-tap loop materialises a padded+shifted
    (H, W, 8) copy per tap — ~25 image-size HBM round trips that measured
    13.4 ms in-context at VGA (the arithmetic is ~0.2 ms).  Here each row
    band is resident in VMEM once and all taps are lane-rolls of it.

    Returns (best_z, best_src):
      best_z   (H, W) f32 — nearest ray-disk hit depth, +inf where none;
      best_src (H, W) f32 — EXACT integer linear index (y*W + x) of the
                winning tap pixel, -1 where none (f32 is exact below 2^24;
                VGA H*W = 307200).
    The winner's normal/appearance attributes are fetched by the caller
    with one packed row-gather over best_src (splat.combined_predict
    phase 2) — tracking them through every tap's select is pure waste.
    """
    H, W = radius.shape

    def tile_kernel(tiles, out_refs, params_ref):
        bh = tiles[0].shape[0] - 2 * window
        wp = tiles[0].shape[1]
        pid = pl.program_id(0)
        fx_ = params_ref[0, 0]
        fy_ = params_ref[0, 1]
        cx_ = params_ref[0, 2]
        cy_ = params_ref[0, 3]
        max_depth_ = params_ref[0, 4]

        # pixel rays of this band (absolute coordinates; pad columns get
        # negative/over-range u — their outputs are cropped by the caller)
        u = (jax.lax.broadcasted_iota(jnp.float32, (bh, wp), 1)
             - float(window))
        y = (jax.lax.broadcasted_iota(jnp.float32, (bh, wp), 0)
             + pid.astype(jnp.float32) * float(band))
        lx = (u - cx_) / fx_
        ly = (y - cy_) / fy_
        lnorm = jnp.sqrt(lx * lx + ly * ly + 1.0)
        lxn = lx / lnorm
        lyn = ly / lnorm
        lzn = 1.0 / lnorm

        best_z = jnp.full((bh, wp), jnp.inf, jnp.float32)
        best_src = jnp.full((bh, wp), -1.0, jnp.float32)

        def shifted(t, dy, dx):
            rows = t[window + dy:window + dy + bh, :]
            if dx == 0:
                return rows
            if _VMEM is not None and not interpret:
                return pltpu.roll(rows, (-dx) % wp, 1)
            return jnp.roll(rows, -dx, 1)

        for dy in range(-window, window + 1):
            for dx in range(-window, window + 1):
                cpx = shifted(tiles[0], dy, dx)
                cpy = shifted(tiles[1], dy, dx)
                cpz = shifted(tiles[2], dy, dx)
                cnx = shifted(tiles[3], dy, dx)
                cny = shifted(tiles[4], dy, dx)
                cnz = shifted(tiles[5], dy, dx)
                crad = shifted(tiles[6], dy, dx)
                alive = shifted(tiles[7], dy, dx) > 0.0

                denom = lxn * cnx + lyn * cny + lzn * cnz
                num = cpx * cnx + cpy * cny + cpz * cnz
                z_star = num / jnp.where(jnp.abs(denom) > 1e-12,
                                         denom, 1e-12)
                hx = lxn * z_star
                hy = lyn * z_star
                z_cam = lzn * z_star
                miss2 = ((hx - cpx) ** 2 + (hy - cpy) ** 2
                         + (z_cam - cpz) ** 2)
                ok = (alive
                      & (miss2 <= crad * crad)
                      & (z_cam > 0.0)
                      & (z_cam <= max_depth_)
                      & (z_cam < best_z))
                src = (jnp.clip(y + float(dy), 0.0, float(H - 1)) * float(W)
                       + jnp.clip(u + float(dx), 0.0, float(W - 1)))
                best_z = jnp.where(ok, z_cam, best_z)
                best_src = jnp.where(ok, src, best_src)

        out_refs[0][:, :] = best_z
        out_refs[1][:, :] = best_src

    planes = [pos[..., 0], pos[..., 1], pos[..., 2],
              normal[..., 0], normal[..., 1], normal[..., 2],
              radius, live.astype(jnp.float32)]
    params = jnp.stack([
        jnp.asarray(v, jnp.float32)
        for v in (fx, fy, cx, cy, max_depth)]).reshape(1, 5)
    best_z, best_src = _tiled_stencil_multi(
        tile_kernel, planes, H, W, halo=window, band=band,
        n_pad_cols=window, fill=0.0, interpret=interpret, n_out=2,
        scalars=[params])
    return best_z, best_src
