"""Round-3 probes: vectorised clean, window-write compact_into, and
micro-costs (gather widths, sorts, cumsums) that bound the remaining
segment-sum / compaction levers.  Scalar outputs only (see CLAUDE.md)."""
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
render_j = jax.jit(lambda m, pi: splat_ops.render_index_map(
    m, pi, intr, H, W, TIME, time_delta, cfg.depth_cutoff))
im1 = jax.block_until_ready(render_j(work, pose_inv))
fuse_j = jax.jit(lambda m, im, p, r: fuse_ops.fuse(
    m, im, p.vmap_raw, p.levels[0]["vmap"], p.levels[0]["nmap"], r, mz,
    jnp.uint8(0), st.pose, intr, TIME, 1.0, cfg.depth_cutoff,
    checkerboard=True, parity=0,
    merge_z_thresh=cfg.surfel_merge_z_thresh))
fres = jax.block_until_ready(fuse_j(work, im1, prep, rj))
timeit("fuse NEW (window compact_into)",
       lambda f=jax.jit(lambda m, im, p, r: ssum(fuse_j(m, im, p, r).map)):
       f(work, im1, prep, rj))

clean_j = jax.jit(lambda fm, im, p: clean_ops.clean(
    fm, im, p.filt_depth, mz, jnp.uint8(0), pose_inv, intr, TIME,
    time_delta, cfg.conf_threshold_global, cfg.depth_cutoff,
    cfg.outlier_coefficient, unstable_time_limit=cfg.unstable_time_limit))
cres = jax.block_until_ready(clean_j(fres.map, im1, prep))
timeit("clean NEW (vectorised counts)",
       lambda f=jax.jit(lambda fm, im, p: ssum(clean_j(fm, im, p).map)):
       f(fres.map, im1, prep))

# ---- micro costs ----
N = B
key = jax.random.PRNGKey(0)
lin_rand = jax.random.randint(key, (N,), 0, H * W)
# surfel-projection-order indices (roughly raster): sorted
lin_sorted = jnp.sort(lin_rand)
table80 = jnp.zeros((H * W, 80), jnp.float16) + 1.0
table16 = jnp.zeros((H * W, 16), jnp.float16) + 1.0
table8f32 = jnp.zeros((H * W, 8), jnp.float32) + 1.0

timeit("gather (HW,80)f16 rand idx",
       lambda f=jax.jit(lambda t, i: ssum(t[i])): f(table80, lin_rand))
timeit("gather (HW,80)f16 sorted idx",
       lambda f=jax.jit(lambda t, i: ssum(t[i])): f(table80, lin_sorted))
timeit("gather (HW,16)f16 rand idx",
       lambda f=jax.jit(lambda t, i: ssum(t[i])): f(table16, lin_rand))
timeit("gather (HW,8)f32 rand idx",
       lambda f=jax.jit(lambda t, i: ssum(t[i])): f(table8f32, lin_rand))

rows80 = jnp.zeros((N, 80), jnp.float16) + 1.0
timeit("transpose (N,80)->(10,8,N) f16",
       lambda f=jax.jit(lambda r: ssum(r.reshape(-1, 10, 8).transpose(1, 2, 0)
                                       .astype(jnp.float32))): f(rows80))

# sorts
k32 = jax.random.randint(key, (N + H * W,), 0, 1 << 22)
v32 = jnp.arange(N + H * W, dtype=jnp.int32)
zf = jax.random.uniform(key, (N + H * W,))
timeit("sort 717k x2 (int keys)",
       lambda f=jax.jit(lambda a, b: ssum(jax.lax.sort((a, b), num_keys=1))):
       f(k32, v32))
timeit("sort 717k x3 (2 keys)",
       lambda f=jax.jit(lambda a, b, c: ssum(jax.lax.sort((a, b, c),
                                                          num_keys=2))):
       f(k32, zf, v32))

# cumsum
mat = jnp.ones((76800, 11), jnp.float32)
timeit("cumsum (76800,11)",
       lambda f=jax.jit(lambda m: ssum(jnp.cumsum(m, axis=0))): f(mat))
matN = jnp.ones((N, 11), jnp.float32)
timeit("cumsum (409600,11)",
       lambda f=jax.jit(lambda m: ssum(jnp.cumsum(m, axis=0))): f(matN))

# segment_sum_dense alone (fuse's pass-2 core)
slots = jax.random.randint(key, (76800,), -1, B)
valid = slots >= 0
vals = [jnp.ones((76800,)), jnp.ones((76800, 3)), jnp.ones((76800, 3)),
        jnp.ones((76800, 3)), jnp.ones((76800,))]
timeit("segment_sum_dense P=76800 cap=409600",
       lambda f=jax.jit(lambda s, vl: ssum(sort_utils.segment_sum_dense(
           s, s >= 0, [vl, jnp.ones((76800, 3)), jnp.ones((76800, 3)),
                       jnp.ones((76800, 3)), vl], B))):
       f(slots, jnp.ones((76800,))))

# compact_self (clean's tail) alone
keepmask = jax.random.uniform(key, (B,)) > 0.01
timeit("compact_self cap=409600",
       lambda f=jax.jit(lambda m, k: ssum(sm.compact_self(m, k))):
       f(sm.prefix_view(fres.map, B), keepmask))

# full fused step
timeit("FULL fused step NEW", lambda f=jax.jit(
    lambda s, r, d: ssum(eng._fused_static_step.__wrapped__(
        s, r, d, TIME, B, 0))): f(st, rj, dj), N=24)
