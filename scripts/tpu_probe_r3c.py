"""Round-3c: find the composition overhead of the fused static step.

Parts sum to ~43 ms but the full step measures ~88 ms; bisect in situ with
FULL-state scalar sums (summing only `count` lets XLA DCE the map update —
the r3b 'step w/o track' number was invalid)."""
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
from maskfusion_tpu.ops import preprocess as pp
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
print("bucket:", B, "count:", eng._last_count, flush=True)
TIME = 100.0
mz = jnp.zeros((H, W), jnp.uint8)


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

full = eng._fused_static_step.__wrapped__
fcp = eng._fuse_clean_predict.__wrapped__
track = eng._track.__wrapped__
preprocess = eng._preprocess.__wrapped__

timeit("FULL step (a)", lambda f=jax.jit(
    lambda s, r, d: ssum(full(s, r, d, TIME, B, 0))): f(st, rj, dj))
timeit("FULL step (b, repeat)", lambda f=jax.jit(
    lambda s, r, d: ssum(full(s, r, d, TIME, B, 0, True))): f(st, rj, dj))
timeit("FULL step no-compact", lambda f=jax.jit(
    lambda s, r, d: ssum(full(s, r, d, TIME, B, 0, False))): f(st, rj, dj))


def step_gt_pose(state, rgb, depth):
    """Everything except the GN solve: track replaced by identity delta."""
    zeros_mask = jnp.zeros((H, W), jnp.uint8)
    prep = preprocess(rgb, depth, zeros_mask)
    prev_pose = state.pose
    new_state, removed, appended = fcp(
        state, prep, rgb, zeros_mask, prev_pose, TIME, jnp.uint8(0),
        cfg.conf_threshold_global, cfg.depth_cutoff,
        cfg.weight_multiplier, True, B, 0, True)
    return ssum(new_state)


timeit("step w/o track (full-state sum)",
       lambda f=jax.jit(step_gt_pose): f(st, rj, dj))


def track_full(state, rgb, depth):
    zeros_mask = jnp.zeros((H, W), jnp.uint8)
    prep = preprocess(rgb, depth, zeros_mask)
    tr = track(state, prep, jnp.uint8(0))
    return ssum(tr)


timeit("preprocess+track (all outputs)",
       lambda f=jax.jit(track_full): f(st, rj, dj))


def step_small_cap(state, rgb, depth):
    """Full step but the map capacity == bucket (no prefix/write_back)."""
    small = MapState(
        map=sm.prefix_view(state.map, B), pose=state.pose,
        last_delta=state.last_delta, pred_vmap=state.pred_vmap,
        pred_nmap=state.pred_nmap, pred_rgb=state.pred_rgb,
        so3_intensity=state.so3_intensity)
    new_state, diag = full(small, rgb, depth, TIME, B, 0, True)
    return ssum(new_state, diag)


timeit("FULL step, capacity==bucket",
       lambda f=jax.jit(step_small_cap): f(st, rj, dj))

# donation reality-check: the engine path donates the state
don = jax.jit(lambda s, r, d: full(s, r, d, TIME, B, 0, True),
              donate_argnums=(0,))
state_copy = jax.tree.map(lambda x: x.copy(), st)
o = don(state_copy, rj, dj)
jax.block_until_ready(o)
t0 = time.perf_counter()
N = 24
for i in range(N):
    o = don(o[0], rj, dj)
jax.device_get(o[1][0])            # one scalar sync
dt = (time.perf_counter() - t0) / N * 1000
print(f"{'FULL step donated (engine-real)':44s} {dt:8.2f} ms", flush=True)
