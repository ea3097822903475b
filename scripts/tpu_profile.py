"""Fine-grained TPU timing of the SLAM pipeline stages."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from maskfusion_tpu.camera import Resolution, CameraIntrinsics
from maskfusion_tpu.config import Config
from maskfusion_tpu.engine import MaskFusion
from maskfusion_tpu.frame import FrameData
from maskfusion_tpu.ops import preprocess as pp

W, H = 640, 480
intr = CameraIntrinsics(528., 528., 320., 240.)
cfg = Config(static_mode=True, global_surfel_capacity=1 << 22)
eng = MaskFusion(Resolution(W, H), intr, cfg)
rng = np.random.default_rng(0)
u, v = np.meshgrid(np.arange(W), np.arange(H))
depth = (1.5 + 0.0004*u + 0.0003*v).astype(np.float32)
rgb = np.stack([(u*3)%256, v%256, (u+v)%256], -1).astype(np.uint8)
eng.process_frame(FrameData(rgb=rgb, depth=depth))
eng.process_frame(FrameData(rgb=rgb, depth=depth))

def bench(name, fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:28s} {dt:8.2f} ms", flush=True)
    return out

rgbj = jnp.asarray(rgb); depthj = jnp.asarray(depth)
maskj = jnp.zeros((H, W), jnp.uint8)
prep = bench("preprocess", eng._preprocess, rgbj, depthj, maskj)
# sub-parts of preprocess
bench("  bilateral", jax.jit(lambda d: pp.bilateral_filter_depth(d, radius=6)), depthj)
bench("  pyramids+vmaps", jax.jit(lambda d, g, m: pp.build_frame_pyramids(d, g, m, intr, 5.0, 3)),
      depthj, pp.rgb_to_intensity(rgbj), maskj)
st = eng.models[0].state
tr = bench("track", eng._track, st, prep, jnp.uint8(0))
bench("fuse_clean_predict", lambda: eng._fuse_clean_predict(
    jax.tree.map(lambda x: x.copy() if hasattr(x,'copy') else x, st), prep, rgbj, maskj,
    jnp.asarray(np.eye(4,dtype=np.float32)), 3.0, jnp.uint8(0), 10.0, 5.0, 1.0, allow_fill_in=True))
# host transfer cost
t0=time.perf_counter()
for _ in range(5):
    jnp.asarray(rgb).block_until_ready(); jnp.asarray(depth).block_until_ready()
print(f"h2d rgb+depth              {(time.perf_counter()-t0)/5*1000:8.2f} ms", flush=True)
