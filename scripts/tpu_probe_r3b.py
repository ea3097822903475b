"""Round-3b probes: full-step bisect + new segment_sum + no-compact clean.

Scalar outputs only (CLAUDE.md measurement methodology)."""
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
from maskfusion_tpu.ops import preprocess as pp, splat as splat_ops, fuse as fuse_ops, clean as clean_ops, fill_in as fill_ops, sort_utils
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
B = 409600
st = glob.state
print("bucket:", B, "count:", eng._last_count, flush=True)
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
    print(f"{name:40s} {dt:8.2f} ms", flush=True)
    return dt


nothing = jax.jit(lambda x: x + 1.0)
timeit("nothing (floor)", lambda: nothing(jnp.float32(1.0)))

prep = jax.block_until_ready(eng._preprocess(rj, dj, mz))
pose_inv = jax.block_until_ready(jax.jit(se3.pose_inverse)(st.pose))
work = sm.prefix_view(st.map, B)

timeit("preprocess", lambda f=jax.jit(
    lambda r, d: ssum(eng._preprocess.__wrapped__(r, d, mz))): f(rj, dj))
timeit("model pyramids", lambda f=jax.jit(
    lambda s: ssum(odo.build_model_pyramids(
        s.pred_vmap, s.pred_nmap, s.pred_rgb, s.pose, 3, 6.0))): f(st))

# new segment_sum alone
key = jax.random.PRNGKey(0)
slots = jax.random.randint(key, (76800,), -1, B)
timeit("segment_sum v2 P=76800 cap=409600",
       lambda f=jax.jit(lambda s, vl: ssum(sort_utils.segment_sum_dense(
           s, s >= 0, [vl, jnp.ones((76800, 3)), jnp.ones((76800, 3)),
                       jnp.ones((76800, 3)), vl], B))):
       f(slots, jnp.ones((76800,))))

render_j = jax.jit(lambda m, pi: splat_ops.render_index_map(
    m, pi, intr, H, W, TIME, time_delta, cfg.depth_cutoff))
im1 = jax.block_until_ready(render_j(work, pose_inv))
timeit("render im1", lambda f=jax.jit(
    lambda m, pi: ssum(render_j(m, pi))): f(work, pose_inv))

fuse_j = jax.jit(lambda m, im, p, r: fuse_ops.fuse(
    m, im, p.vmap_raw, p.levels[0]["vmap"], p.levels[0]["nmap"], r, mz,
    jnp.uint8(0), st.pose, intr, TIME, 1.0, cfg.depth_cutoff,
    checkerboard=True, parity=0,
    merge_z_thresh=cfg.surfel_merge_z_thresh))
fres = jax.block_until_ready(fuse_j(work, im1, prep, rj))
timeit("fuse (segsum v2 + window append)",
       lambda f=jax.jit(lambda m, im, p, r: ssum(fuse_j(m, im, p, r).map)):
       f(work, im1, prep, rj))

clean_j = jax.jit(lambda fm, im, p: clean_ops.clean(
    fm, im, p.filt_depth, mz, jnp.uint8(0), pose_inv, intr, TIME,
    time_delta, cfg.conf_threshold_global, cfg.depth_cutoff,
    cfg.outlier_coefficient, unstable_time_limit=cfg.unstable_time_limit))
timeit("clean (with compact_self)",
       lambda f=jax.jit(lambda fm, im, p: ssum(clean_j(fm, im, p).map)):
       f(fres.map, im1, prep))


# no-compact clean variant: kill in place (mask fields), skip compact_self
def clean_nc(fm, im, p):
    cres = clean_ops.clean(
        fm, im, p.filt_depth, mz, jnp.uint8(0), pose_inv, intr, TIME,
        time_delta, cfg.conf_threshold_global, cfg.depth_cutoff,
        cfg.outlier_coefficient, unstable_time_limit=cfg.unstable_time_limit,
        compact=False)
    return cres.map


timeit("clean (no-compact kill)",
       lambda f=jax.jit(lambda fm, im, p: ssum(clean_nc(fm, im, p))):
       f(fres.map, im1, prep))

# full-step bisect
full = eng._fused_static_step.__wrapped__
timeit("FULL fused step", lambda f=jax.jit(
    lambda s, r, d: ssum(full(s, r, d, TIME, B, 0))): f(st, rj, dj), N=24)


def step_no_track(state, rgb, depth, time):
    zeros_mask = jnp.zeros((H, W), jnp.uint8)
    prep2 = eng._preprocess.__wrapped__(rgb, depth, zeros_mask)
    prev_pose = state.pose
    new_state, removed, appended = eng._fuse_clean_predict.__wrapped__(
        state, prep2, rgb, zeros_mask, prev_pose, time, jnp.uint8(0),
        cfg.conf_threshold_global, cfg.depth_cutoff,
        cfg.weight_multiplier, True, B, 0)
    return ssum(new_state.map.count, removed, appended, new_state.pose)


timeit("step w/o track", lambda f=jax.jit(step_no_track):
       f(st, rj, dj, TIME), N=24)


def track_only(state, rgb, depth, time):
    zeros_mask = jnp.zeros((H, W), jnp.uint8)
    prep2 = eng._preprocess.__wrapped__(rgb, depth, zeros_mask)
    tr = eng._track.__wrapped__(state, prep2, jnp.uint8(0))
    return ssum(tr.pose, tr.icp_error)


timeit("preprocess+track only", lambda f=jax.jit(track_only):
       f(st, rj, dj, TIME), N=24)
