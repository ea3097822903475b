"""DCE-prefix bisect of the TRACK stage (16.3 ms in-context, the largest
static-step stage): model pyramids, SO3 pre-align, then each GN pyramid
level — all under the ENGINE config (assoc_period=5, gn_step_eps=1e-6).
Run alone on the TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
from maskfusion_tpu.camera import Resolution, CameraIntrinsics
from maskfusion_tpu.config import Config
from maskfusion_tpu.engine import MaskFusion
from maskfusion_tpu.frame import FrameData
from maskfusion_tpu.tracking import odometry as odo

W, H = 640, 480
intr = CameraIntrinsics(528., 528., 320., 240.)
cfg = Config(static_mode=True, global_surfel_capacity=1 << 22)
eng = MaskFusion(Resolution(W, H), intr, cfg)
u, v = np.meshgrid(np.arange(W), np.arange(H))
d0 = (1.5 + 0.0004 * u + 0.0003 * v).astype(np.float32)
r0 = np.stack([(u * 3) % 256, v % 256, (u + v) % 256], -1).astype(np.uint8)
eng.process_frame(FrameData(rgb=r0, depth=d0))
eng.process_frame(FrameData(rgb=r0, depth=d0))
eng.flush_diagnostics()
st = eng.models[0].state
rj, dj = jnp.asarray(r0), jnp.asarray((d0 * 1000).astype(np.uint16))
mz = jnp.zeros((H, W), jnp.uint8)
prep = jax.block_until_ready(eng._preprocess(rj, dj, mz))


def ssum(*xs):
    tot = jnp.float32(0)
    for x in xs:
        for l in jax.tree.leaves(x):
            tot = tot + jnp.sum(l.astype(jnp.float32))
    return tot


def timeit(name, jfn, N=48, prev=[0.0]):
    o = jfn()
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(N):
        o = jfn()
    jax.device_get(o)
    dt = (time.perf_counter() - t0) / N * 1000
    print(f"{name:44s} {dt:8.2f} ms   (+{dt - prev[0]:6.2f})", flush=True)
    prev[0] = dt
    return dt


nothing = jax.jit(lambda x: x + 1.0)
timeit("floor", lambda: nothing(jnp.float32(1.0)))

# ground truth: the engine's own jitted track closure (incl. model pyramids)
timeit("engine _track (all-in)",
       lambda: eng._track(st, prep, jnp.uint8(0)))

mp_s = jax.jit(lambda s: ssum(odo.build_model_pyramids(
    s.pred_vmap, s.pred_nmap, s.pred_rgb, s.pose)))
timeit("model pyramids alone", lambda: mp_s(st))

frame_pyr = jax.block_until_ready(jax.jit(
    lambda p, r: odo.build_frame_pyramids_for_odometry(p.levels, r))(
        prep, rj))
model_pyr = jax.block_until_ready(jax.jit(
    lambda s: odo.build_model_pyramids(
        s.pred_vmap, s.pred_nmap, s.pred_rgb, s.pose))(st))

# engine config for the GN itself
ENG = dict(assoc_period=cfg.assoc_period, gn_step_eps=cfg.gn_step_eps,
           icp_weight=cfg.icp_weight)

for name, kw in (
        ("GN level0 x3 (fast_odom)", dict(fast_odom=True, use_so3=False)),
        ("GN level0 x10 (pyramid=False)",
         dict(pyramid=False, use_so3=False)),
        ("GN full (10,5,4)", dict(use_so3=False)),
        ("GN full + so3", dict(use_so3=True)),
        ("GN full+so3 assoc_period=1",
         dict(use_so3=True, assoc_period=1)),
        ("GN full+so3 no step eps",
         dict(use_so3=True, gn_step_eps=0.0)),
):
    def f(s, fp=frame_pyr, mp=model_pyr, kw=kw):
        kk = dict(ENG)
        kk.update(kw)
        so3i = ((None, None, s.so3_intensity)
                if kk.pop("use_so3") else None)
        res = odo.get_incremental_transformation(
            s.pose[:3, 3], s.pose[:3, :3], fp, mp, so3i, intr,
            use_so3=so3i is not None, **kk)
        return ssum(res.R, res.t, res.A, res.icp_error)
    try:
        jf = jax.jit(f)
        timeit(name, lambda jf=jf: jf(st))
    except Exception as e:
        print(name, "failed:", repr(e)[:200], flush=True)
