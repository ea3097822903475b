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


def _tiled_stencil(kernel_tile, planes, H, W, halo, band, n_pad_cols,
                   fill, interpret):
    """Run kernel_tile(tile_list, out_block) over row bands.

    planes: list of (H, W) arrays.  Each is padded to
    (band + Hp + band, Wp) with `fill`; the grid program i reads bands
    i, i+1, i+2 (prev/curr/next) per plane and writes out band i."""
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

    def kernel(*refs):
        in_refs = refs[:-1]
        out_ref = refs[-1]
        tiles = []
        for pi in range(n_planes):
            prev = in_refs[pi * 3 + 0]
            curr = in_refs[pi * 3 + 1]
            nxt = in_refs[pi * 3 + 2]
            tiles.append(jnp.concatenate(
                [prev[band - halo:band, :], curr[:, :], nxt[:halo, :]],
                axis=0))
        kernel_tile(tiles, out_ref)

    in_specs = []
    for _ in range(n_planes):
        for off in (0, 1, 2):
            in_specs.append(pl.BlockSpec(
                (band, Wp), lambda i, off=off: (i + off, 0),
                **({"memory_space": _VMEM}
                   if _VMEM is not None and not interpret else {})))
    out_specs = pl.BlockSpec(
        (band, Wp), lambda i: (i, 0),
        **({"memory_space": _VMEM}
           if _VMEM is not None and not interpret else {}))

    out = pl.pallas_call(
        kernel,
        grid=(n_bands,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        interpret=interpret,
    )(*[p for p in padded for _ in range(3)])
    return out[:H, n_pad_cols:n_pad_cols + W]


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
