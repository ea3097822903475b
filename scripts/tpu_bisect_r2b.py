"""Round-2b bisect: prefix ablation of the fused static step.

Each variant compiles the REAL fused-step graph truncated after stage k
(XLA dead-code-eliminates everything the returned value doesn't need), so
successive differences give true in-context stage costs — stage
micro-benches mismeasure fusion effects and per-dispatch overhead.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from maskfusion_tpu.camera import Resolution, CameraIntrinsics
from maskfusion_tpu.config import Config
from maskfusion_tpu.engine import MaskFusion
from maskfusion_tpu.frame import FrameData
from maskfusion_tpu.mapping import surfel_map as sm
from maskfusion_tpu.ops import preprocess as pp, splat as splat_ops, fuse as fuse_ops, clean as clean_ops, fill_in as fill_ops
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
print("bucket:", B, "count:", eng._last_count, flush=True)

time_delta = cfg.effective_time_delta()
PARITY = 0
TIME = 100.0


def step_prefix(state, rgb, depth, upto):
    zeros_mask = jnp.zeros((H, W), jnp.uint8)
    prep = eng._preprocess(rgb, depth, zeros_mask)
    if upto == "preprocess":
        return prep.filt_depth
    model_pyr = odo.build_model_pyramids(
        state.pred_vmap, state.pred_nmap, state.pred_rgb,
        state.pose, cfg.num_pyr_levels, cfg.max_depth_rgb)
    if upto == "modelpyr":
        return model_pyr.vmaps_g[0]
    so3_pyr = [None] * cfg.num_pyr_levels
    so3_pyr[cfg.num_pyr_levels - 1] = state.so3_intensity
    res = odo.get_incremental_transformation(
        state.pose[:3, 3], state.pose[:3, :3],
        prep.frame_pyr, model_pyr, tuple(so3_pyr), intr,
        icp_weight=cfg.icp_weight, use_so3=cfg.use_so3,
        mask_id=jnp.uint8(0),
        sobel_scale=cfg.sobel_scale,
        min_grad_magnitudes=cfg.min_grad_magnitudes,
        assoc_period=cfg.assoc_period,
        num_levels=cfg.num_pyr_levels)
    pose = se3.make_pose(res.R, res.t)
    if upto == "track":
        return pose
    pose_inv = se3.pose_inverse(pose)
    full_map = state.map
    work = sm.prefix_view(full_map, B)
    im1 = splat_ops.render_index_map(
        work, pose_inv, intr, H, W, TIME, time_delta, cfg.depth_cutoff)
    if upto == "render":
        return im1.depth
    weighting = fuse_ops.compute_fusion_weight(state.last_delta, 1.0)
    fres = fuse_ops.fuse(
        work, im1, prep.vmap_raw,
        prep.levels[0]["vmap"], prep.levels[0]["nmap"],
        rgb, zeros_mask, jnp.uint8(0), pose, intr, TIME, weighting,
        cfg.depth_cutoff, checkerboard=True, parity=PARITY,
        merge_z_thresh=cfg.surfel_merge_z_thresh)
    if upto == "fuse":
        return fres.map.count, fres.map.conf
    cres = clean_ops.clean(
        fres.map, im1, prep.filt_depth, zeros_mask, jnp.uint8(0), pose_inv,
        intr, TIME, time_delta, cfg.conf_threshold_global, cfg.depth_cutoff,
        cfg.outlier_coefficient, unstable_time_limit=cfg.unstable_time_limit)
    if upto == "clean":
        return cres.map.count, cres.map.conf
    conf_px = sm.pixel_confidence(H, W, intr, 1.0) * weighting
    rad_px = sm.radius_from_depth(
        prep.levels[0]["vmap"][..., 2], prep.levels[0]["nmap"][..., 2], intr)
    snap = splat_ops.post_fuse_snapshot(
        im1, fres.map.pos, fres.map.normal, fres.map.color,
        fres.map.radius, fres.map.init_time, cres.conf, cres.keep,
        work.count, fres.new_pixels,
        prep.vmap_raw, prep.levels[0]["nmap"], rgb, conf_px, rad_px,
        TIME, pose_inv)
    if upto == "snapshot":
        return snap.depth, cres.map.count
    pred = splat_ops.combined_predict(snap, intr, cfg.depth_cutoff)
    if upto == "predict":
        return pred.depth, cres.map.count
    filled = fill_ops.fill_in(
        pred, rgb, prep.levels[0]["vmap"], prep.levels[0]["nmap"])
    return filled.vmap, filled.nmap, filled.rgb, cres.map.count


STAGES = ["preprocess", "modelpyr", "track", "render", "fuse", "clean",
          "snapshot", "predict", "full"]


def timeit(name, jfn, N=24):
    o = jfn()
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for i in range(N):
        o = jfn()
    leaf = jax.tree.leaves(o)[0]
    jax.device_get(leaf.ravel()[0])
    dt = (time.perf_counter() - t0) / N * 1000
    print(f"{name:14s} {dt:8.1f} ms", flush=True)
    return dt


prev = 0.0
for s in STAGES:
    f = jax.jit(lambda state, rgb, depth, s=s: step_prefix(state, rgb, depth, s))
    dt = timeit(s, lambda: f(st, rj, dj))
    print(f"   delta {s:12s} {dt - prev:8.1f} ms", flush=True)
    prev = dt
