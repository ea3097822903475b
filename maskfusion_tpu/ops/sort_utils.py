"""Sort-based replacements for large scatters.

XLA's TPU scatter lowers to a *serialised* per-update loop, which makes the
natural scatter formulations of z-buffering, stream compaction and
segment-sum minutes-slow at surfel-map sizes (measured: a single 4M-element
scatter dominates the whole frame).  TPU sorts and gathers are fast, so
every large scatter in the mapping layer is reformulated here as
sort + cumsum + searchsorted + gather:

  zbuffer_render   — scatter-min z-buffer -> lexicographic sort + first-of-
                     segment lookup (deterministic: ties break to the lowest
                     slot via stable sort)
  segment_sum_dense — scatter-add accumulation -> sort + cumsum + boundary
                     differences
  compact          — prefix-sum scatter compaction -> stable sort by !keep
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _searchsorted(sorted_arr: jnp.ndarray, queries: jnp.ndarray,
                  side: str = "left") -> jnp.ndarray:
    # 'sort' method: TPU sorts are fast while the alternatives (binary
    # search = log2(N) dependent gathers, 'scan') hit the slow gather path
    # — measured ~2x worse than one extra sort at these sizes.
    return jnp.searchsorted(sorted_arr, queries, side=side, method="sort")


def zbuffer_render(
    lin: jnp.ndarray,       # (N,) linear pixel index per element
    z: jnp.ndarray,         # (N,) depth
    valid: jnp.ndarray,     # (N,) bool
    n_pixels: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest-depth visibility: per pixel, the slot index of the smallest-z
    valid element (-1 if none) and its depth (inf if none).

    Gather-free double-sort: one sentinel row per pixel (z = -inf) sorts to
    the FRONT of its pixel's segment, so the winner is simply the next row;
    a second sort keyed by the sentinels' pixel ids lands the per-pixel
    results contiguously in image order.  On TPU two sorts of N+P rows beat
    any searchsorted/gather formulation (random gathers run ~100x below
    bandwidth; sorts do not)."""
    n = lin.shape[0]
    slot = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    key = jnp.where(valid, lin, n_pixels).astype(jnp.int32)
    zk = jnp.where(valid, z, jnp.inf)

    pix = jax.lax.broadcasted_iota(jnp.int32, (n_pixels, 1), 0)[:, 0]
    all_key = jnp.concatenate([key, pix])
    all_z = jnp.concatenate([zk, jnp.full((n_pixels,), -jnp.inf)])
    all_slot = jnp.concatenate([slot, jnp.full((n_pixels,), -1, jnp.int32)])

    skey, sz, sslot = jax.lax.sort((all_key, all_z, all_slot), num_keys=2)

    # winner of pixel p = the row right after p's sentinel (if same pixel)
    nxt_key = jnp.concatenate([skey[1:], jnp.full((1,), n_pixels, jnp.int32)])
    nxt_z = jnp.concatenate([sz[1:], jnp.full((1,), jnp.inf)])
    nxt_slot = jnp.concatenate([sslot[1:], jnp.full((1,), -1, jnp.int32)])
    is_sentinel = sslot < 0
    hit = is_sentinel & (nxt_key == skey) & (nxt_slot >= 0)
    res_key = jnp.where(is_sentinel & (skey < n_pixels), skey, n_pixels)
    res_slot = jnp.where(hit, nxt_slot, -1)
    res_z = jnp.where(hit, nxt_z, jnp.inf)

    # second sort: sentinels (one per pixel, unique keys) to the front in
    # pixel order; slice the first n_pixels rows
    okey, oslot, oz = jax.lax.sort((res_key, res_slot, res_z), num_keys=1)
    return oslot[:n_pixels], oz[:n_pixels]


def segment_sum_dense(
    slots: jnp.ndarray,              # (P,) target slot per record
    valid: jnp.ndarray,              # (P,) bool
    values: Sequence[jnp.ndarray],   # each (P,) or (P, C)
    cap: int,
) -> list:
    """Sum each value array per slot into dense (cap, ...) outputs.

    Merged sentinel-sort formulation (the zbuffer_render pattern): one
    sentinel row per slot sorts IN FRONT of that slot's records, so the
    running column cumsum AT each sentinel equals the prefix sum of all
    records in earlier slots; consecutive-sentinel differences are the
    segment totals.  One (P+cap)-row sort + one row-gather + one cumsum +
    one extraction sort — all individually near-free on TPU, unlike the
    previous jnp.searchsorted(method='sort') composition which measured
    ~8.6 ms at (P=76800, cap=409600) against ~0.3 ms for its parts."""
    p = slots.shape[0]
    key = jnp.where(valid, slots, cap).astype(jnp.int32)
    mat, slices = pack_columns(values)
    mat = jnp.where(valid[:, None], mat, 0.0)

    sent = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)[:, 0]
    allk = jnp.concatenate([key, sent])
    # tag: sentinel (0) sorts before records (1) of the same slot
    tag = jnp.concatenate([jnp.ones((p,), jnp.int32),
                           jnp.zeros((cap,), jnp.int32)])
    row = jnp.concatenate([
        jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)[:, 0],
        jnp.full((cap,), p, jnp.int32)])          # sentinels -> zero row
    k1, t1, r1 = jax.lax.sort((allk, tag, row), num_keys=2)

    matp = jnp.concatenate([mat, jnp.zeros_like(mat[:1])], axis=0)
    c = jnp.cumsum(matp[r1], axis=0)              # (P+cap, C)

    # extract the cap sentinel rows in slot order
    k2 = jnp.where(t1 == 0, k1, cap)
    pos = jax.lax.broadcasted_iota(jnp.int32, (p + cap, 1), 0)[:, 0]
    _, p3 = jax.lax.sort((k2, pos), num_keys=1)
    csent = c[p3[:cap]]                           # (cap, C) prefix at slot
    total = c[-1:]                                # all valid records
    csent_ext = jnp.concatenate([csent, total], axis=0)
    sums = csent_ext[1:] - csent_ext[:-1]
    return unpack_columns(sums, slices)


def pack_columns(arrays: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, list]:
    """Stack 1D/2D float arrays into one (N, C) f32 matrix so downstream
    gathers move rows instead of C separate scalar streams.  Returns the
    matrix and the column slices for unpacking."""
    cols = []
    slices = []
    at = 0
    for a in arrays:
        a2 = a[:, None] if a.ndim == 1 else a
        cols.append(a2.astype(jnp.float32))
        slices.append((at, at + a2.shape[1], a.ndim == 1))
        at += a2.shape[1]
    return jnp.concatenate(cols, axis=1), slices


def unpack_columns(mat: jnp.ndarray, slices) -> list:
    out = []
    for (a, b, was_1d) in slices:
        v = mat[:, a:b]
        out.append(v[:, 0] if was_1d else v)
    return out


def compact(
    keep: jnp.ndarray,               # (N,) bool
    arrays: Sequence[jnp.ndarray],
) -> Tuple[list, jnp.ndarray]:
    """Stable stream compaction: kept elements first (original order),
    remaining slots zero-filled.  One sort + ONE row-gather over a packed
    column matrix.  Returns (compacted arrays, kept count)."""
    n = keep.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    key = jnp.where(keep, idx, n).astype(jnp.int32)
    skey, sidx = jax.lax.sort((key, idx), num_keys=1)
    count = jnp.sum(keep.astype(jnp.int32))
    live = idx < count
    mat, slices = pack_columns(arrays)
    g = jnp.where(live[:, None], mat[sidx], 0.0)
    outs = []
    for o, a in zip(unpack_columns(g, slices), arrays):
        outs.append(o.astype(a.dtype))
    return outs, count
