"""Micro-profile of surfel-pass components on TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from maskfusion_tpu.camera import CameraIntrinsics
from maskfusion_tpu.mapping import surfel_map as sm
from maskfusion_tpu.ops import splat as splat_ops, fuse as fuse_ops, clean as clean_ops
from maskfusion_tpu.ops import preprocess as pp

W, H = 640, 480
CAP = 1 << 22
intr = CameraIntrinsics(528., 528., 320., 240.)
rng = np.random.default_rng(0)
u, v = np.meshgrid(np.arange(W), np.arange(H))
depth = (1.5 + 0.0004*u + 0.0003*v).astype(np.float32)
rgb = np.stack([(u*3)%256, v%256, (u+v)%256], -1).astype(np.uint8)

vmap = pp.create_vmap(jnp.asarray(depth), intr, 5.0)
nmap = pp.create_nmap(vmap)
m = sm.init_from_frame(CAP, vmap, vmap, nmap, jnp.asarray(rgb),
                       jnp.zeros((H,W),jnp.uint8), jnp.uint8(0), jnp.eye(4), intr, 1.0)
jax.block_until_ready(m)
print("live surfels:", int(m.count), flush=True)

def bench(name, fn, *args, n=3, **kw):
    f = jax.jit(fn, **kw)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args); jax.block_until_ready(out)
    print(f"{name:26s} {(time.perf_counter()-t0)/n*1000:9.2f} ms", flush=True)
    return out

im = bench("render_index_map", lambda mm: splat_ops.render_index_map(mm, jnp.eye(4), intr, H, W, 2.0, 200, 5.0), m)
bench("combined_predict", lambda i: splat_ops.combined_predict(i, intr, 5.0), im)
bench("fuse", lambda mm, i: fuse_ops.fuse(mm, i, vmap, vmap, nmap, jnp.asarray(rgb),
      jnp.zeros((H,W),jnp.uint8), jnp.uint8(0), jnp.eye(4), intr, 2.0, 1.0, 5.0), m, im)
bench("clean", lambda mm, i: clean_ops.clean(mm, i, jnp.asarray(depth), jnp.zeros((H,W),jnp.uint8),
      jnp.uint8(0), jnp.eye(4), intr, 2.0, 200, 10.0, 5.0, 3.0), m, im)
bench("compact_self only", lambda mm: sm.compact_self(mm, mm.conf > 0.5), m)
# scatter-min in isolation
pos = m.pos
def scatter_min_test(mm):
    z = mm.pos[:,2]
    lin = jnp.clip((mm.pos[:,0]*100).astype(jnp.int32), 0, H*W)
    zb = jnp.full((H*W+1,), jnp.inf, jnp.float32)
    return zb.at[lin].min(z)
bench("raw scatter-min 4M", scatter_min_test, m)
# sort-based alternative
def sort_test(mm):
    z = mm.pos[:,2]
    lin = jnp.clip((mm.pos[:,0]*100).astype(jnp.int32), 0, H*W)
    slot = jnp.arange(CAP, dtype=jnp.int32)
    slin, sz, sslot = jax.lax.sort((lin, z, slot), num_keys=2)
    first = jnp.concatenate([jnp.array([True]), slin[1:] != slin[:-1]])
    zb = jnp.full((H*W+1,), jnp.inf, jnp.float32)
    zb = zb.at[jnp.where(first, slin, H*W)].set(sz, mode="drop", unique_indices=False)
    return zb
bench("sort-based index 4M", sort_test, m)
