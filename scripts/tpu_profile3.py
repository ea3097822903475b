"""Stage profile at the 512k working bucket."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from maskfusion_tpu.camera import CameraIntrinsics
from maskfusion_tpu.mapping import surfel_map as sm
from maskfusion_tpu.ops import splat as splat_ops, fuse as fuse_ops, clean as clean_ops
from maskfusion_tpu.ops import preprocess as pp
from maskfusion_tpu.tracking import odometry as odo

W, H = 640, 480
CAP = 1 << 19
intr = CameraIntrinsics(528., 528., 320., 240.)
u, v = np.meshgrid(np.arange(W), np.arange(H))
depth = (1.5 + 0.0004*u + 0.0003*v).astype(np.float32)
rgb = np.stack([(u*3)%256, v%256, (u+v)%256], -1).astype(np.uint8)
rgbj, depthj = jnp.asarray(rgb), jnp.asarray(depth)
maskj = jnp.zeros((H,W), jnp.uint8)

vmap = pp.create_vmap(depthj, intr, 5.0)
nmap = pp.create_nmap(vmap)
m = sm.init_from_frame(CAP, vmap, vmap, nmap, rgbj, maskj, jnp.uint8(0), jnp.eye(4), intr, 1.0)
jax.block_until_ready(m)
print("live:", int(m.count), "/", CAP, flush=True)

def bench(name, fn, *args, n=5):
    f = jax.jit(fn)
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*args); jax.block_until_ready(o)
    print(f"{name:26s} {(time.perf_counter()-t0)/n*1000:9.2f} ms", flush=True)
    return o

bench("bilateral(unrolled)", lambda d: pp.bilateral_filter_depth(d, radius=6), depthj)
bench("build_frame_pyramids", lambda d,g,mm: pp.build_frame_pyramids(d,g,mm,intr,5.0,3), depthj, pp.rgb_to_intensity(rgbj), maskj)
im = bench("render_index_map", lambda mm: splat_ops.render_index_map(mm, jnp.eye(4), intr, H, W, 2.0, 200, 5.0), m)
bench("combined_predict", lambda i: splat_ops.combined_predict(i, intr, 5.0), im)
bench("fuse", lambda mm, i: fuse_ops.fuse(mm, i, vmap, vmap, nmap, rgbj, maskj, jnp.uint8(0), jnp.eye(4), intr, 2.0, 1.0, 5.0), m, im)
bench("clean", lambda mm, i: clean_ops.clean(mm, i, depthj, maskj, jnp.uint8(0), jnp.eye(4), intr, 2.0, 200, 10.0, 5.0, 3.0), m, im)
bench("compact_self", lambda mm: sm.compact_self(mm, mm.conf > 0.5), m)
