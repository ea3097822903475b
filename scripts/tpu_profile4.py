"""Bisect clean/fuse internals at 512k."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from maskfusion_tpu.camera import CameraIntrinsics
from maskfusion_tpu.mapping import surfel_map as sm
from maskfusion_tpu.ops import splat as splat_ops, sort_utils
from maskfusion_tpu.ops import preprocess as pp
from maskfusion_tpu.ops.fuse import half_pixel_taps_unique

W, H = 640, 480
CAP = 1 << 19
intr = CameraIntrinsics(528., 528., 320., 240.)
u, v = np.meshgrid(np.arange(W), np.arange(H))
depth = (1.5 + 0.0004*u + 0.0003*v).astype(np.float32)
rgb = np.stack([(u*3)%256, v%256, (u+v)%256], -1).astype(np.uint8)
vmap = pp.create_vmap(jnp.asarray(depth), intr, 5.0)
nmap = pp.create_nmap(vmap)
m = sm.init_from_frame(CAP, vmap, vmap, nmap, jnp.asarray(rgb),
                       jnp.zeros((H,W),jnp.uint8), jnp.uint8(0), jnp.eye(4), intr, 1.0)
im = splat_ops.render_index_map(m, jnp.eye(4), intr, H, W, 2.0, 200, 5.0)
jax.block_until_ready((m, im))

def bench(name, fn, *args, n=5):
    f = jax.jit(fn)
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*args); jax.block_until_ready(o)
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1000:9.2f} ms", flush=True)

packed = splat_ops.pack_index_fields(im)
jax.block_until_ready(packed)
x = np.random.default_rng(0).uniform(0, W, CAP).astype(np.float32)
y = np.random.default_rng(1).uniform(0, H, CAP).astype(np.float32)
xj, yj = jnp.asarray(x), jnp.asarray(y)

def taps_only(px, xx, yy):
    acc = jnp.zeros((CAP,), jnp.float32)
    for ty, tx, mult in half_pixel_taps_unique(xx, yy):
        linp = jnp.clip(ty, 0, H-1)*W + jnp.clip(tx, 0, W-1)
        rows = px[linp]
        acc = acc + rows[:, 0] * mult
    return acc
bench("9x row-gather 512k", taps_only, packed, xj, yj)

def one_gather(px, xx):
    linp = jnp.clip(xx.astype(jnp.int32), 0, H*W-1)
    return px[linp].sum(axis=1)
bench("1x row-gather 512k", one_gather, packed, xj*H)

def compact_pk(mm):
    keep = mm.conf > 0.5
    outs, cnt = sort_utils.compact(keep, [mm.pos, mm.conf, mm.color, mm.init_time, mm.last_seen, mm.normal, mm.radius])
    return outs[0], cnt
bench("compact packed 512k", compact_pk, m)

def sort_only(mm):
    idx = jnp.arange(CAP, dtype=jnp.int32)
    key = jnp.where(mm.conf > 0.5, idx, CAP)
    return jax.lax.sort((key, idx), num_keys=1)
bench("sort(key,idx) 512k", sort_only, m)

def ss_only(mm):
    sk = jnp.sort(jnp.clip(mm.pos[:,0].astype(jnp.int32), 0, H*W))
    tgt = jnp.arange(H*W+1, dtype=jnp.int32)
    return jnp.searchsorted(sk, tgt, method="sort")
bench("searchsorted 307k tgts", ss_only, m)

def zbuf(mm):
    lin = jnp.clip((mm.pos[:,0]*100).astype(jnp.int32), 0, H*W-1)
    return sort_utils.zbuffer_render(lin, mm.pos[:,2], mm.conf>0, H*W)
bench("zbuffer_render 512k", zbuf, m)
