"""Prototype probe: combined_predict's L0 scan lowering alternatives.

The shipping XLA lowering pays ~25 image-size HBM round trips: each of the
(2w+1)^2 taps does its own jnp.pad+slice of an (H, W, 8) packed plane, and
the 8-channel minor dim occupies 8/128 lanes.  Variants:

  A  shipping scan (pad per tap, channel-last)          [reference output]
  B  one shared pad, slice per tap, channel-last
  C  one shared pad, slice per tap, CHANNEL-FIRST (8, Hp, Wp) planes
  D  C with precomputed s = p.n (drops one 3-mul dot per tap)

Run alone on the TPU.
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
if os.environ.get("MFT_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

H = int(os.environ.get("MFT_H", 480))
W = int(os.environ.get("MFT_W", 640))
WIN = 2
FX = FY = 528.0
CX, CY = 320.0, 240.0
MAXD = 8.0

rng = np.random.default_rng(0)
u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                   np.arange(H, dtype=np.float32))
z = 1.5 + 0.0004 * u + 0.0003 * v + rng.normal(0, 0.002, (H, W))
px = (u - CX) / FX * z
py = (v - CY) / FY * z
pos = np.stack([px, py, z], -1).astype(np.float32)
nrm = np.tile(np.array([0, 0, -1], np.float32), (H, W, 1))
nrm += rng.normal(0, 0.05, (H, W, 3)).astype(np.float32)
nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
rad = (0.002 + 0.001 * rng.random((H, W))).astype(np.float32)
live = rng.random((H, W)) > 0.25
pos = np.where(live[..., None], pos, 0.0)
nrm = np.where(live[..., None], nrm, 0.0)
rad = np.where(live, rad, 0.0)

jpos, jnrm, jrad = jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(rad)
jlive = jnp.asarray(live)

lx = (jnp.asarray(u) - CX) / FX
ly = (jnp.asarray(v) - CY) / FY
ln = jnp.sqrt(lx * lx + ly * ly + 1.0)
L = jnp.stack([lx / ln, ly / ln, 1.0 / ln], -1)
yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)


def scan_A(jpos, jnrm, jrad, jlive):
    def shift2(arr, dy, dx, fill):
        h, w = arr.shape[:2]
        pad = [(max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx))]
        pad += [(0, 0)] * (arr.ndim - 2)
        p = jnp.pad(arr, pad, constant_values=fill)
        return p[max(0, dy):max(0, dy) + h, max(0, dx):max(0, dx) + w]

    best_z = jnp.full((H, W), jnp.inf, jnp.float32)
    best_src = jnp.full((H, W), -1, jnp.int32)
    packed0 = jnp.concatenate([
        jpos, jnrm,
        jnp.stack([jrad, jlive.astype(jnp.float32)], -1)], -1)
    for dy in range(-WIN, WIN + 1):
        for dx in range(-WIN, WIN + 1):
            t = shift2(packed0, dy, dx, 0.0)
            cp, cn = t[..., 0:3], t[..., 3:6]
            crad, lv = t[..., 6], t[..., 7] > 0
            denom = jnp.sum(L * cn, -1)
            z_star = jnp.sum(cp * cn, -1) / jnp.where(
                jnp.abs(denom) > 1e-12, denom, 1e-12)
            hit = L * z_star[..., None]
            z_cam = hit[..., 2]
            miss2 = jnp.sum((hit - cp) ** 2, -1)
            ok = (lv & (miss2 <= crad * crad) & (z_cam > 0)
                  & (z_cam <= MAXD) & (z_cam < best_z))
            best_z = jnp.where(ok, z_cam, best_z)
            src = (jnp.clip(yy + dy, 0, H - 1) * W
                   + jnp.clip(xx + dx, 0, W - 1))
            best_src = jnp.where(ok, src, best_src)
    return best_z, best_src


def scan_B(jpos, jnrm, jrad, jlive):
    packed0 = jnp.concatenate([
        jpos, jnrm,
        jnp.stack([jrad, jlive.astype(jnp.float32)], -1)], -1)
    padded = jnp.pad(packed0, ((WIN, WIN), (WIN, WIN), (0, 0)))
    best_z = jnp.full((H, W), jnp.inf, jnp.float32)
    best_src = jnp.full((H, W), -1, jnp.int32)
    for dy in range(-WIN, WIN + 1):
        for dx in range(-WIN, WIN + 1):
            t = jax.lax.dynamic_slice(
                padded, (WIN + dy, WIN + dx, 0), (H, W, 8))
            cp, cn = t[..., 0:3], t[..., 3:6]
            crad, lv = t[..., 6], t[..., 7] > 0
            denom = jnp.sum(L * cn, -1)
            z_star = jnp.sum(cp * cn, -1) / jnp.where(
                jnp.abs(denom) > 1e-12, denom, 1e-12)
            hit = L * z_star[..., None]
            z_cam = hit[..., 2]
            miss2 = jnp.sum((hit - cp) ** 2, -1)
            ok = (lv & (miss2 <= crad * crad) & (z_cam > 0)
                  & (z_cam <= MAXD) & (z_cam < best_z))
            best_z = jnp.where(ok, z_cam, best_z)
            src = (jnp.clip(yy + dy, 0, H - 1) * W
                   + jnp.clip(xx + dx, 0, W - 1))
            best_src = jnp.where(ok, src, best_src)
    return best_z, best_src


def _planes(jpos, jnrm, jrad, jlive, with_s):
    ps = [jpos[..., 0], jpos[..., 1], jpos[..., 2],
          jnrm[..., 0], jnrm[..., 1], jnrm[..., 2],
          jnp.where(jlive, jrad * jrad, -1.0)]
    if with_s:
        ps.append(jnp.sum(jpos * jnrm, -1))
    arr = jnp.stack(ps, 0)
    return jnp.pad(arr, ((0, 0), (WIN, WIN), (WIN, WIN)))


def scan_CD(jpos, jnrm, jrad, jlive, with_s):
    padded = _planes(jpos, jnrm, jrad, jlive, with_s)
    C = padded.shape[0]
    best_z = jnp.full((H, W), jnp.inf, jnp.float32)
    best_src = jnp.full((H, W), -1, jnp.int32)
    l0, l1, l2 = L[..., 0], L[..., 1], L[..., 2]
    for dy in range(-WIN, WIN + 1):
        for dx in range(-WIN, WIN + 1):
            t = jax.lax.dynamic_slice(
                padded, (0, WIN + dy, WIN + dx), (C, H, W))
            cpx, cpy, cpz = t[0], t[1], t[2]
            cnx, cny, cnz = t[3], t[4], t[5]
            rad2 = t[6]
            s = t[7] if with_s else cpx * cnx + cpy * cny + cpz * cnz
            denom = l0 * cnx + l1 * cny + l2 * cnz
            z_star = s / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
            hx = l0 * z_star - cpx
            hy = l1 * z_star - cpy
            z_cam = l2 * z_star
            hz = z_cam - cpz
            miss2 = hx * hx + hy * hy + hz * hz
            ok = ((miss2 <= rad2) & (z_cam > 0)
                  & (z_cam <= MAXD) & (z_cam < best_z))
            best_z = jnp.where(ok, z_cam, best_z)
            src = (jnp.clip(yy + dy, 0, H - 1) * W
                   + jnp.clip(xx + dx, 0, W - 1))
            best_src = jnp.where(ok, src, best_src)
    return best_z, best_src


def ssum(o):
    return (jnp.sum(jnp.where(jnp.isinf(o[0]), 0.0, o[0]))
            + jnp.sum(o[1].astype(jnp.float32)))


def timeit(name, jfn, N=48):
    o = jfn()
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(N):
        o = jfn()
    jax.device_get(o)
    dt = (time.perf_counter() - t0) / N * 1000
    print(f"{name:40s} {dt:8.2f} ms", flush=True)
    return dt


fa = jax.jit(lambda a, b, c, d: ssum(scan_A(a, b, c, d)))
fb = jax.jit(lambda a, b, c, d: ssum(scan_B(a, b, c, d)))
fc = jax.jit(lambda a, b, c, d: ssum(scan_CD(a, b, c, d, False)))
fd = jax.jit(lambda a, b, c, d: ssum(scan_CD(a, b, c, d, True)))

# correctness first (cheap: one eval each, compare scalars)
ra = float(jax.device_get(fa(jpos, jnrm, jrad, jlive)))
for nm, f in (("B", fb), ("C", fc), ("D", fd)):
    rv = float(jax.device_get(f(jpos, jnrm, jrad, jlive)))
    print(f"consistency {nm}: {rv:.3f} vs A {ra:.3f} "
          f"{'OK' if abs(rv - ra) < 1.0 else 'MISMATCH'}", flush=True)

nothing = jax.jit(lambda x: x + 1.0)
timeit("floor", lambda: nothing(jnp.float32(1.0)))
timeit("A pad-per-tap channel-last (ship)",
       lambda: fa(jpos, jnrm, jrad, jlive))
timeit("B shared-pad channel-last",
       lambda: fb(jpos, jnrm, jrad, jlive))
timeit("C shared-pad channel-first",
       lambda: fc(jpos, jnrm, jrad, jlive))
timeit("D C + precomputed p.n",
       lambda: fd(jpos, jnrm, jrad, jlive))
