"""SLIC superpixels in JAX.

Equivalent of the reference's gSLICr wrapper (Core/Segmentation/Slic.{h,cpp},
16-px spacing): grid-seeded local k-means over (lab-ish color, position)
with the standard 3x3-neighbourhood assignment restriction, plus the
down/upsampling helpers CfSegmentation uses.  Segment means use the
sort-based segment sums (TPU scatter is slow)."""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from maskfusion_tpu.ops import sort_utils


class SlicResult(NamedTuple):
    labels: jnp.ndarray       # (H, W) int32 superpixel id
    grid_hw: Tuple[int, int]  # (gh, gw) superpixel grid shape
    mean_rgb: jnp.ndarray     # (gh*gw, 3)
    mean_pos: jnp.ndarray     # (gh*gw, 2) y, x
    counts: jnp.ndarray       # (gh*gw,)


def slic(rgb: jnp.ndarray, spacing: int = 16, iterations: int = 4,
         compactness: float = 0.1) -> SlicResult:
    H, W = rgb.shape[:2]
    gh, gw = H // spacing, W // spacing
    n = gh * gw
    f = rgb.astype(jnp.float32) / 255.0

    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    # initial assignment: regular grid
    gy = jnp.clip((yy / spacing).astype(jnp.int32), 0, gh - 1)
    gx = jnp.clip((xx / spacing).astype(jnp.int32), 0, gw - 1)
    labels = gy * gw + gx

    m2 = (compactness / spacing) ** 2

    for _ in range(iterations):
        sums = sort_utils.segment_sum_dense(
            labels.reshape(-1), jnp.ones((H * W,), bool),
            [f.reshape(-1, 3),
             jnp.stack([yy, xx], -1).reshape(-1, 2),
             jnp.ones((H * W,), jnp.float32)],
            n,
        )
        s_rgb, s_pos, s_cnt = sums
        inv = 1.0 / jnp.maximum(s_cnt, 1.0)
        c_rgb = (s_rgb * inv[:, None]).reshape(gh, gw, 3)
        c_pos = (s_pos * inv[:, None]).reshape(gh, gw, 2)

        # assignment: best of the 3x3 neighbouring clusters of the pixel's
        # grid cell — dense shifts, no gathers
        best_d = jnp.full((H, W), jnp.inf)
        best_l = labels
        base_gy = jnp.clip((yy / spacing).astype(jnp.int32), 0, gh - 1)
        base_gx = jnp.clip((xx / spacing).astype(jnp.int32), 0, gw - 1)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                cy = jnp.clip(base_gy + dy, 0, gh - 1)
                cx = jnp.clip(base_gx + dx, 0, gw - 1)
                # cluster attribute lookup: (gh, gw) tables are tiny; use
                # image-sized upsampled tables via take (cheap at this size)
                cr = c_rgb[cy, cx]
                cp = c_pos[cy, cx]
                d = (jnp.sum((f - cr) ** 2, -1)
                     + m2 * ((yy - cp[..., 0]) ** 2 + (xx - cp[..., 1]) ** 2))
                lab = cy * gw + cx
                upd = d < best_d
                best_d = jnp.where(upd, d, best_d)
                best_l = jnp.where(upd, lab, best_l)
        labels = best_l

    sums = sort_utils.segment_sum_dense(
        labels.reshape(-1), jnp.ones((H * W,), bool),
        [f.reshape(-1, 3),
         jnp.stack([yy, xx], -1).reshape(-1, 2),
         jnp.ones((H * W,), jnp.float32)],
        n,
    )
    s_rgb, s_pos, s_cnt = sums
    inv = 1.0 / jnp.maximum(s_cnt, 1.0)
    return SlicResult(
        labels=labels, grid_hw=(gh, gw),
        mean_rgb=s_rgb * inv[:, None] * 255.0,
        mean_pos=s_pos * inv[:, None],
        counts=s_cnt,
    )


def downsample(values: jnp.ndarray, labels: jnp.ndarray, n: int,
               reduce: str = "mean") -> jnp.ndarray:
    """Per-superpixel reduction of a (H, W[, C]) map (Slic::downsample)."""
    H, W = values.shape[:2]
    v = values.reshape(H * W, -1).astype(jnp.float32)
    valid = jnp.isfinite(v).all(axis=1)
    v = jnp.where(valid[:, None], v, 0.0)
    s, c = sort_utils.segment_sum_dense(
        labels.reshape(-1), valid, [v, jnp.ones((H * W,), jnp.float32)], n)
    out = s / jnp.maximum(c[:, None], 1.0)
    return out if values.ndim == 3 else out[:, 0]


def upsample(per_spx: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Superpixel values back to pixels (Slic::upsample)."""
    return per_spx[labels]
