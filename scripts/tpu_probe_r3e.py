"""Round-3e: after the unrolled-Cholesky fix — track cost, full step, and
optimization_barrier experiments on the fcp composition anomalies."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from maskfusion_tpu.camera import Resolution, CameraIntrinsics
from maskfusion_tpu.config import Config
from maskfusion_tpu.engine import MaskFusion, MapState
from maskfusion_tpu.frame import FrameData
from maskfusion_tpu.mapping import surfel_map as sm
from maskfusion_tpu.ops import splat as splat_ops, fuse as fuse_ops, clean as clean_ops, fill_in as fill_ops
from maskfusion_tpu import se3

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
rj, dj = jnp.asarray(r0), jnp.asarray(d0)
glob = eng.models[0]
B = 409600
st = glob.state
print("bucket:", B, flush=True)
TIME = 100.0
mz = jnp.zeros((H, W), jnp.uint8)
time_delta = cfg.effective_time_delta()


def ssum(*xs):
    tot = jnp.float32(0)
    for x in xs:
        for l in jax.tree.leaves(x):
            tot = tot + jnp.sum(l.astype(jnp.float32))
    return tot


def timeit(name, jfn, N=24):
    o = jfn()
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for i in range(N):
        o = jfn()
    jax.device_get(o)
    dt = (time.perf_counter() - t0) / N * 1000
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


nothing = jax.jit(lambda x: x + 1.0)
timeit("nothing (floor)", lambda: nothing(jnp.float32(1.0)), N=48)

preprocess = eng._preprocess.__wrapped__
track = eng._track.__wrapped__


def mk_track(pick):
    def f(state, rgb, depth):
        prep = preprocess(rgb, depth, mz)
        tr = track(state, prep, jnp.uint8(0))
        return ssum(*pick(tr))
    return jax.jit(f)


timeit("track: pose only (unrolled chol)",
       lambda f=mk_track(lambda tr: (tr.pose,)): f(st, rj, dj))
timeit("track: ALL (unrolled cov)",
       lambda f=mk_track(lambda tr: (tr,)): f(st, rj, dj))

full = eng._fused_static_step.__wrapped__
timeit("FULL step (after chol fix)", lambda f=jax.jit(
    lambda s, r, d: ssum(full(s, r, d, TIME, B, 0, True))): f(st, rj, dj))
timeit("FULL step no-compact", lambda f=jax.jit(
    lambda s, r, d: ssum(full(s, r, d, TIME, B, 0, False))): f(st, rj, dj))


def mk_fcp(barrier):
    def f(state, rgb, depth):
        prep = preprocess(rgb, depth, mz)
        pose = state.pose
        pose_inv = se3.pose_inverse(pose)
        full_map = state.map
        work = sm.prefix_view(full_map, B)
        im1 = splat_ops.render_index_map(
            work, pose_inv, intr, H, W, TIME, time_delta, cfg.depth_cutoff)
        fres = fuse_ops.fuse(
            work, im1, prep.vmap_raw, prep.levels[0]["vmap"],
            prep.levels[0]["nmap"], rgb, mz, jnp.uint8(0), pose, intr,
            TIME, 1.0, cfg.depth_cutoff, checkerboard=True, parity=0,
            merge_z_thresh=cfg.surfel_merge_z_thresh)
        fmap = fres.map
        if barrier:
            fmap = jax.lax.optimization_barrier(fmap)
        im2 = splat_ops.render_index_map(
            fmap, pose_inv, intr, H, W, TIME, time_delta, cfg.depth_cutoff)
        cres = clean_ops.clean(
            fmap, im2, prep.filt_depth, mz, jnp.uint8(0), pose_inv,
            intr, TIME, time_delta, cfg.conf_threshold_global,
            cfg.depth_cutoff, cfg.outlier_coefficient,
            unstable_time_limit=cfg.unstable_time_limit)
        final_map = sm.write_back(full_map, cres.map)
        idx = im2.index
        keep_img = jnp.where(idx >= 0, cres.keep[jnp.clip(idx, 0)], False)
        im2_gated = im2._replace(index=jnp.where(keep_img, idx, -1))
        im_coarse = splat_ops.render_index_map(
            cres.map, pose_inv, intr.level(2), H >> 2, W >> 2, TIME,
            time_delta, cfg.depth_cutoff)
        if barrier:
            im2_gated = jax.lax.optimization_barrier(im2_gated)
            im_coarse = jax.lax.optimization_barrier(im_coarse)
        pred = splat_ops.combined_predict(im2_gated, intr, cfg.depth_cutoff,
                                          coarse=(im_coarse, 2))
        filled = fill_ops.fill_in(pred, rgb, prep.levels[0]["vmap"],
                                  prep.levels[0]["nmap"])
        return ssum(final_map, filled)
    return jax.jit(f)


timeit("fcp full (no barrier)", lambda f=mk_fcp(False): f(st, rj, dj))
timeit("fcp full (barriers)", lambda f=mk_fcp(True): f(st, rj, dj))
