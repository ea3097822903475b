"""Quick scalar-output probes for the most recently changed stages."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from maskfusion_tpu.camera import Resolution, CameraIntrinsics
from maskfusion_tpu.config import Config
from maskfusion_tpu.engine import MaskFusion
from maskfusion_tpu.frame import FrameData
from maskfusion_tpu.mapping import surfel_map as sm
from maskfusion_tpu.ops import splat as splat_ops, fuse as fuse_ops, clean as clean_ops, sort_utils
from maskfusion_tpu import se3
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
rj, dj = jnp.asarray(r0), jnp.asarray(d0)
glob = eng.models[0]
B = sm.choose_bucket(eng._last_count, glob.state.map.capacity)
st = glob.state
print("bucket:", B, flush=True)
time_delta = cfg.effective_time_delta()
TIME = 100.0
mz = jnp.zeros((H, W), jnp.uint8)


def ssum(*xs):
    tot = jnp.float32(0)
    for x in xs:
        for l in jax.tree.leaves(x):
            tot = tot + jnp.sum(l.astype(jnp.float32))
    return tot


def timeit(name, jfn, N=48):
    o = jfn()
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for i in range(N):
        o = jfn()
    jax.device_get(o)
    dt = (time.perf_counter() - t0) / N * 1000
    print(f"{name:36s} {dt:8.2f} ms", flush=True)
    return dt


nothing = jax.jit(lambda x: x + 1.0)
timeit("nothing (floor)", lambda: nothing(jnp.float32(1.0)))

prep_j = jax.jit(lambda r, d: eng._preprocess(r, d, mz))
prep = jax.block_until_ready(prep_j(rj, dj))
mp_j = jax.jit(lambda s: odo.build_model_pyramids(
    s.pred_vmap, s.pred_nmap, s.pred_rgb, s.pose, 3, 6.0))
mp = jax.block_until_ready(mp_j(st))


def track_scalar(s, p, m, period):
    so3_pyr = [None, None, s.so3_intensity]
    res = odo.get_incremental_transformation(
        s.pose[:3, 3], s.pose[:3, :3], p.frame_pyr, m, tuple(so3_pyr), intr,
        icp_weight=cfg.icp_weight, use_so3=cfg.use_so3, mask_id=jnp.uint8(0),
        sobel_scale=cfg.sobel_scale,
        min_grad_magnitudes=cfg.min_grad_magnitudes,
        assoc_period=period, num_levels=3)
    return ssum(res.t, res.R)


for period in (3, 5):
    timeit(f"track period={period}",
           lambda f=jax.jit(lambda s, p, m, pe=period: track_scalar(s, p, m, pe)):
           f(st, prep, mp))

pose_inv = jax.block_until_ready(jax.jit(se3.pose_inverse)(st.pose))
work = sm.prefix_view(st.map, B)
render_j = jax.jit(lambda m, pi: splat_ops.render_index_map(
    m, pi, intr, H, W, TIME, time_delta, cfg.depth_cutoff))
im1 = jax.block_until_ready(render_j(work, pose_inv))
fuse_j = jax.jit(lambda m, im, p, r: fuse_ops.fuse(
    m, im, p.vmap_raw, p.levels[0]["vmap"], p.levels[0]["nmap"], r, mz,
    jnp.uint8(0), st.pose, intr, TIME, 1.0, cfg.depth_cutoff,
    checkerboard=True, parity=0,
    merge_z_thresh=cfg.surfel_merge_z_thresh))
fres = jax.block_until_ready(fuse_j(work, im1, prep, rj))
timeit("fuse (1-gather segsum)",
       lambda f=jax.jit(lambda m, im, p, r: ssum(fuse_j(m, im, p, r).map)):
       f(work, im1, prep, rj))

clean_j = jax.jit(lambda fm, im, p: clean_ops.clean(
    fm, im, p.filt_depth, mz, jnp.uint8(0), pose_inv, intr, TIME,
    time_delta, cfg.conf_threshold_global, cfg.depth_cutoff,
    cfg.outlier_coefficient, unstable_time_limit=cfg.unstable_time_limit))
cres = jax.block_until_ready(clean_j(fres.map, im1, prep))
timeit("clean (f16 table)",
       lambda f=jax.jit(lambda fm, im, p: ssum(clean_j(fm, im, p).map)):
       f(fres.map, im1, prep))

conf_px = sm.pixel_confidence(H, W, intr, 1.0)
rad_px = jax.jit(lambda p: sm.radius_from_depth(
    p.levels[0]["vmap"][..., 2], p.levels[0]["nmap"][..., 2], intr))(prep)
im2 = jax.block_until_ready(render_j(fres.map, pose_inv))
timeit("render im2 (post-fuse)",
       lambda f=jax.jit(lambda m, pi: ssum(render_j(m, pi))):
       f(fres.map, pose_inv))
idx = im2.index
keep_img = jnp.where(idx >= 0, cres.keep[jnp.clip(idx, 0)], False)
im2_gated = im2._replace(index=jnp.where(keep_img, idx, -1))
rc_j = jax.jit(lambda m, pi: splat_ops.render_index_map(
    m, pi, intr.level(2), H >> 2, W >> 2, TIME, time_delta,
    cfg.depth_cutoff))
im_c = jax.block_until_ready(rc_j(cres.map, pose_inv))
timeit("render coarse (H/4)",
       lambda f=jax.jit(lambda m, pi: ssum(rc_j(m, pi))): f(cres.map, pose_inv))
timeit("predict coarse-render",
       lambda f=jax.jit(lambda s_, c_: ssum(splat_ops.combined_predict(
           s_, intr, cfg.depth_cutoff, coarse=(c_, 2)))): f(im2_gated, im_c))
timeit("predict L0 only",
       lambda f=jax.jit(lambda s_: ssum(splat_ops.combined_predict(
           s_, intr, cfg.depth_cutoff))): f(im2_gated))

timeit("FULL fused step", lambda f=jax.jit(
    lambda s, r, d: ssum(eng._fused_static_step.__wrapped__(
        s, r, d, TIME, B, 0))): f(st, rj, dj), N=24)
