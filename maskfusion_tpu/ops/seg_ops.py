"""Geometric segmentation kernels (device side).

TPU-native equivalents of Core/Cuda/segmentation.cu:
  - `geometric_edge_map`   (computeGeometricSegmentation_Kernel, :122-177)
  - `morph_close_float`    (f_dilate/f_erode, :179-215 + morphGeometric..., :314-332)
  - `morph_binary`         (dilate/erode uchar, :217-255, :334-354)
  - `threshold_map` / `invert_map` (:257-269)
  - `joint_bilateral_filter` (bilateralFilter_Kernel, :23-94) — used when the
    segmentation front-end filters its own depth instead of reusing the
    tracking maps (REUSE_FILTERED_MAPS=false path, MfSegmentation.cpp:56,154).
All are dense stencils over (H, W) maps — pure VPU work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_OFFS8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def _shift(img, dy, dx, fill):
    H, W = img.shape[:2]
    pad = [(max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx))]
    pad += [(0, 0)] * (img.ndim - 2)
    p = jnp.pad(img, pad, constant_values=fill)
    return p[max(0, dy):max(0, dy) + H, max(0, dx):max(0, dx) + W]


def geometric_edge_map(
    vmap: jnp.ndarray,      # (H, W, 3), NaN invalid
    nmap: jnp.ndarray,
    weight_distance: float,
    weight_concavity: float,
) -> jnp.ndarray:
    """Per-pixel 'edginess' in [0, 1]:
    max(wC * concavity, wD * distance-discontinuity) over the 8-neighbourhood.
    Border pixels and invalid depth are 1.0 (always edges)."""
    H, W = vmap.shape[:2]
    v = vmap
    n = nmap
    c_term = jnp.zeros((H, W), jnp.float32)
    d_term = jnp.zeros((H, W), jnp.float32)
    for dy, dx in _OFFS8:
        v_n = _shift(v, dy, dx, jnp.nan)
        n_n = _shift(n, dy, dx, jnp.nan)
        dvec = v_n - v
        # concavity (getConcavityTerm:105-111): 0 on convex side
        side = jnp.sum(dvec * n, axis=-1)
        conc = 1.0 - jnp.sum(n_n * n, axis=-1)
        conc = jnp.where(side < 0, 0.0, conc)
        c_term = jnp.maximum(c_term, jnp.nan_to_num(conc, nan=0.0))
        # distance discontinuity (getDistanceTerm:114-118)
        dist = jnp.abs(jnp.sum(dvec * n, axis=-1))
        d_term = jnp.maximum(d_term, jnp.nan_to_num(dist, nan=0.0))
    edge = jnp.minimum(
        1.0, jnp.maximum(c_term * weight_concavity, d_term * weight_distance)
    )
    u = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    vv = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    border = (u < 1) | (u >= W - 1) | (vv < 1) | (vv >= H - 1)
    invalid = jnp.logical_not(jnp.isfinite(v[..., 0])) | (v[..., 2] <= 0)
    return jnp.where(border | invalid, 1.0, edge)


def _window_extreme(img, radius, is_max, include_center):
    out = img if include_center else (
        jnp.full_like(img, -jnp.inf if is_max else jnp.inf)
    )
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dy == 0 and dx == 0 and not include_center:
                continue
            fill = -jnp.inf if is_max else jnp.inf
            nb = _shift(img, dy, dx, fill)
            out = jnp.maximum(out, nb) if is_max else jnp.minimum(out, nb)
    return out


def morph_binary(mask: jnp.ndarray, radius: int, iterations: int) -> jnp.ndarray:
    """Binary closing: `iterations` rounds of dilate-then-erode over a
    (2r+1)^2 window, center excluded like the reference kernels
    (segmentation.cu:217-255)."""
    m = mask
    for _ in range(iterations):
        d = _window_extreme(m.astype(jnp.float32), radius, True, False) > 0
        m = _window_extreme(d.astype(jnp.float32), radius, False, False) > 0
    return m


def threshold_map(edge: jnp.ndarray, threshold: float) -> jnp.ndarray:
    return edge > threshold


def joint_bilateral_filter(
    rgb: jnp.ndarray,
    depth: jnp.ndarray,
    radius: int = 8,
    sigma_depth: float = 0.1,
    sigma_color: float = 40.0,
    sigma_location: float = 5.0,
) -> jnp.ndarray:
    """Joint color/depth/space bilateral depth filter (segmentation.cu:23-76).
    Defaults are the GUI's operative values (GUI.h:362-365)."""
    H, W = depth.shape
    isd = 0.5 / (sigma_depth * sigma_depth)
    isc = 0.5 / (sigma_color * sigma_color)
    isl = 0.5 / (sigma_location * sigma_location)
    rgbf = rgb.astype(jnp.float32)
    sum_v = jnp.zeros((H, W), jnp.float32)
    sum_w = jnp.zeros((H, W), jnp.float32)
    offs = [(dy, dx) for dy in range(-radius, radius + 1)
            for dx in range(-radius, radius + 1)]
    offs_arr = jnp.array(offs, jnp.int32)
    pad_d = jnp.pad(depth, radius, constant_values=jnp.inf)
    pad_c = jnp.pad(rgbf, [(radius, radius), (radius, radius), (0, 0)],
                    constant_values=0.0)

    def body(carry, off):
        sv, sw = carry
        dy, dx = off[0], off[1]
        nd = jax.lax.dynamic_slice(pad_d, (radius + dy, radius + dx), (H, W))
        nc = jax.lax.dynamic_slice(
            pad_c, (radius + dy, radius + dx, 0), (H, W, 3)
        )
        loc2 = (dy * dy + dx * dx).astype(jnp.float32)
        col2 = jnp.sum((rgbf - nc) ** 2, axis=-1)
        dep2 = (depth - nd) ** 2
        w = jnp.exp(-loc2 * isl - dep2 * isd - col2 * isc)
        w = jnp.where(jnp.isfinite(nd), w, 0.0)
        return (sv + jnp.where(jnp.isfinite(nd), nd, 0.0) * w, sw + w), None

    (sum_v, sum_w), _ = jax.lax.scan(body, (sum_v, sum_w), offs_arr)
    return sum_v / jnp.maximum(sum_w, 1e-20)
