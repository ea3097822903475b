"""Round-3f: decompose fcp's predict tail (+14.4 ms in situ vs ~4.7 parts)
and clean (+4.8 vs standalone); try cheaper predict windows."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from maskfusion_tpu.camera import Resolution, CameraIntrinsics
from maskfusion_tpu.config import Config
from maskfusion_tpu.engine import MaskFusion
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
B = 409600
st = eng.models[0].state
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
    print(f"{name:46s} {dt:8.2f} ms", flush=True)
    return dt


nothing = jax.jit(lambda x: x + 1.0)
timeit("nothing (floor)", lambda: nothing(jnp.float32(1.0)), N=48)
preprocess = eng._preprocess.__wrapped__


def mk(stop, window=2, use_coarse=True):
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
        im2 = splat_ops.render_index_map(
            fres.map, pose_inv, intr, H, W, TIME, time_delta,
            cfg.depth_cutoff)
        if stop == "im2":
            return ssum(sm.write_back(full_map, fres.map), im2)
        cres = clean_ops.clean(
            fres.map, im2, prep.filt_depth, mz, jnp.uint8(0), pose_inv,
            intr, TIME, time_delta, cfg.conf_threshold_global,
            cfg.depth_cutoff, cfg.outlier_coefficient,
            unstable_time_limit=cfg.unstable_time_limit)
        final_map = sm.write_back(full_map, cres.map)
        if stop == "clean":
            return ssum(final_map)
        idx = im2.index
        keep_img = jnp.where(idx >= 0, cres.keep[jnp.clip(idx, 0)], False)
        im2_gated = im2._replace(index=jnp.where(keep_img, idx, -1))
        if stop == "gate":
            return ssum(final_map, im2_gated.index)
        coarse = None
        if use_coarse:
            im_coarse = splat_ops.render_index_map(
                cres.map, pose_inv, intr.level(2), H >> 2, W >> 2, TIME,
                time_delta, cfg.depth_cutoff)
            coarse = (im_coarse, 2)
        if stop == "coarse":
            return ssum(final_map, im2_gated.index, coarse[0])
        pred = splat_ops.combined_predict(im2_gated, intr, cfg.depth_cutoff,
                                          window=window, coarse=coarse)
        if stop == "pred":
            return ssum(final_map, pred)
        filled = fill_ops.fill_in(pred, rgb, prep.levels[0]["vmap"],
                                  prep.levels[0]["nmap"])
        return ssum(final_map, filled)
    return jax.jit(f)


timeit("fcp through im2", lambda f=mk("im2"): f(st, rj, dj))
timeit("fcp through clean", lambda f=mk("clean"): f(st, rj, dj))
timeit("fcp through gate", lambda f=mk("gate"): f(st, rj, dj))
timeit("fcp through coarse render", lambda f=mk("coarse"): f(st, rj, dj))
timeit("fcp through predict w=2", lambda f=mk("pred"): f(st, rj, dj))
timeit("fcp through predict w=1", lambda f=mk("pred", window=1):
       f(st, rj, dj))
timeit("fcp full w=2", lambda f=mk("all"): f(st, rj, dj))
timeit("fcp full w=1", lambda f=mk("all", window=1): f(st, rj, dj))
