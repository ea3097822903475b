"""Honest stage bisect: N pipelined iterations + one final sync."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from maskfusion_tpu.camera import Resolution, CameraIntrinsics
from maskfusion_tpu.config import Config
from maskfusion_tpu.engine import MaskFusion, MapState
from maskfusion_tpu.frame import FrameData
from maskfusion_tpu.mapping import surfel_map as sm
from maskfusion_tpu.ops import preprocess as pp, splat as splat_ops, fuse as fuse_ops, clean as clean_ops, fill_in as fill_ops
from maskfusion_tpu import se3
from maskfusion_tpu.tracking import odometry as odo

W,H=640,480
intr = CameraIntrinsics(528.,528.,320.,240.)
cfg = Config(static_mode=True, global_surfel_capacity=1<<22)
eng = MaskFusion(Resolution(W,H), intr, cfg)
u,v = np.meshgrid(np.arange(W), np.arange(H))
d0 = (1.5+0.0004*u+0.0003*v).astype(np.float32)
r0 = np.stack([(u*3)%256, v%256, (u+v)%256],-1).astype(np.uint8)
eng.process_frame(FrameData(rgb=r0, depth=d0)); eng.process_frame(FrameData(rgb=r0, depth=d0))
eng.flush_diagnostics()
rj, dj = jnp.asarray(r0), jnp.asarray(d0)
glob = eng.models[0]
B = sm.choose_bucket(eng._last_count, glob.state.map.capacity)
st = glob.state
mz = jnp.zeros((H,W),jnp.uint8)

def timeit(name, jfn, N=8):
    o = jfn(0); jax.device_get(jax.tree.leaves(o)[0].ravel()[0])  # warm + sync
    t0=time.perf_counter()
    for i in range(N): o = jfn(i)
    jax.device_get(jax.tree.leaves(o)[0].ravel()[0])
    print(f"{name:30s} {(time.perf_counter()-t0)/N*1000:8.1f} ms", flush=True)

pre = jax.jit(lambda r, d: eng._preprocess(r, d, mz))
timeit("preprocess", lambda i: pre(rj, dj))
prep = pre(rj, dj)
trk = jax.jit(lambda s, p: eng._track(s, p, jnp.uint8(0)))
timeit("track", lambda i: trk(st, prep))

@jax.jit
def render(s):
    return splat_ops.render_index_map(sm.prefix_view(s.map, B), se3.pose_inverse(s.pose), intr, H, W, 3.0, 1<<30, 5.0)
timeit("render_index_map", lambda i: render(st))
im = render(st)

@jax.jit
def just_fuse(s, i_m, p):
    return fuse_ops.fuse(sm.prefix_view(s.map, B), i_m, p.levels[0]["vmap"], p.levels[0]["vmap"], p.levels[0]["nmap"], rj, mz, jnp.uint8(0), s.pose, intr, 3.0, 1.0, 5.0)
timeit("fuse", lambda i: just_fuse(st, im, prep))
fres = just_fuse(st, im, prep)

@jax.jit
def just_clean(fm, i_m, p, s):
    return clean_ops.clean(fm, i_m, p.filt_depth, mz, jnp.uint8(0), se3.pose_inverse(s.pose), intr, 3.0, 1<<30, 10.0, 5.0, 3.0)
timeit("clean", lambda i: just_clean(fres.map, im, prep, st))

@jax.jit
def just_pred(i_m):
    return splat_ops.combined_predict(i_m, intr, 5.0)
timeit("combined_predict", lambda i: just_pred(im))
