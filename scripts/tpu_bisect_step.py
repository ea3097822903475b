"""In-context bisect of the fused static step: time progressively longer
PREFIXES of the real stage chain (XLA DCE cuts everything after the consume
point), so deltas are in-context stage costs — unlike isolated stage probes,
whose cross-stage fusion and floor effects made them add up to half the
measured 58 ms step.  Run alone on the TPU."""
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
from maskfusion_tpu.mapping import surfel_map as sm
from maskfusion_tpu.ops import (splat as splat_ops, fuse as fuse_ops,
                                clean as clean_ops, fill_in as fill_ops)
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
B = 409600
st = eng.models[0].state
rj, dj = jnp.asarray(r0), jnp.asarray((d0 * 1000).astype(np.uint16))
TIME = 100.0
td = cfg.effective_time_delta()
mz = jnp.zeros((H, W), jnp.uint8)
print("bucket:", B, "count:", eng._last_count, flush=True)


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


def chain(upto):
    """Build the step up to stage `upto`; consume everything computed."""
    def run(state, rgb, depth):
        acc = []
        prep = eng._preprocess.__wrapped__(rgb, depth, mz) \
            if hasattr(eng._preprocess, "__wrapped__") \
            else eng._preprocess(rgb, depth, mz)
        acc.append(prep)
        if upto >= 1:
            tr = eng._track.__wrapped__(state, prep, jnp.uint8(0)) \
                if hasattr(eng._track, "__wrapped__") \
                else eng._track(state, prep, jnp.uint8(0))
            acc.append(tuple(jax.tree.leaves(tr)))
            pose = tr.pose
        else:
            pose = state.pose
        pose_inv = se3.pose_inverse(pose)
        work = sm.prefix_view(state.map, B)
        if upto >= 2:
            im1 = splat_ops.render_index_map(
                work, pose_inv, intr, H, W, TIME, td, cfg.depth_cutoff)
            acc.append(im1)
        if upto >= 3:
            fres = fuse_ops.fuse(
                work, im1, prep.vmap_raw, prep.levels[0]["vmap"],
                prep.levels[0]["nmap"], rgb, mz, jnp.uint8(0), pose, intr,
                TIME, 1.0, cfg.depth_cutoff,
                checkerboard=cfg.fuse_subsample_checkerboard, parity=0,
                merge_z_thresh=cfg.surfel_merge_z_thresh)
            acc.append(fres)
        if upto >= 4:
            conf_px = sm.pixel_confidence(H, W, intr, 1.0)
            rad_px = sm.radius_from_depth(
                prep.levels[0]["vmap"][..., 2],
                prep.levels[0]["nmap"][..., 2], intr)
            im2 = splat_ops.patch_index_map(
                im1, fres.map, fres.new_pixels, prep.vmap_raw,
                prep.levels[0]["nmap"], conf_px, rgb, rad_px,
                pose_inv, TIME, work.count)
            acc.append(im2)
        if upto >= 5:
            cres = clean_ops.clean(
                fres.map, im2, prep.filt_depth, mz, jnp.uint8(0), pose_inv,
                intr, TIME, td, cfg.conf_threshold_global, cfg.depth_cutoff,
                cfg.outlier_coefficient,
                unstable_time_limit=cfg.unstable_time_limit, compact=False)
            acc.append(cres)
        if upto >= 6:
            im_coarse = splat_ops.render_index_map(
                cres.map, pose_inv, intr.level(2), H >> 2, W >> 2, TIME,
                td, cfg.depth_cutoff)
            acc.append(im_coarse)
        if upto >= 7:
            idx = im2.index
            keep_img = jnp.where(idx >= 0, cres.keep[jnp.clip(idx, 0)],
                                 False)
            im2g = im2._replace(index=jnp.where(keep_img, idx, -1))
            pred = splat_ops.combined_predict(
                im2g, intr, cfg.depth_cutoff, coarse=(im_coarse, 2))
            acc.append(pred)
        if upto >= 8:
            filled = fill_ops.fill_in(
                pred, rgb, prep.levels[0]["vmap"], prep.levels[0]["nmap"])
            final_map = sm.write_back(state.map, cres.map)
            acc.append(filled)
            acc.append((final_map.count, ssum(final_map.conf)))
        return ssum(*acc)
    return jax.jit(run)


nothing = jax.jit(lambda x: x + 1.0)
timeit("floor", lambda: nothing(jnp.float32(1.0)))
names = ["preprocess", "+track", "+render im1", "+fuse",
         "+patch im2", "+clean(nc)", "+render coarse", "+predict",
         "+fill_in/write_back (full)"]
for i, nm in enumerate(names):
    f = chain(i)
    try:
        timeit(nm, lambda f=f: f(st, rj, dj))
    except Exception as e:
        print(nm, "failed:", repr(e)[:200], flush=True)
        break
