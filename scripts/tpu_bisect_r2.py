"""Round-2 bisect: ablate clean/track/fuse internals to find real device costs."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from maskfusion_tpu.camera import Resolution, CameraIntrinsics
from maskfusion_tpu.config import Config
from maskfusion_tpu.engine import MaskFusion
from maskfusion_tpu.frame import FrameData
from maskfusion_tpu.mapping import surfel_map as sm
from maskfusion_tpu.ops import preprocess as pp, splat as splat_ops, fuse as fuse_ops, clean as clean_ops, sort_utils
from maskfusion_tpu.ops.fuse import half_pixel_taps_unique
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
mz = jnp.zeros((H, W), jnp.uint8)
print("bucket:", B, "count:", eng._last_count, flush=True)


def timeit(name, jfn, N=8):
    o = jfn(0); jax.device_get(jax.tree.leaves(o)[0].ravel()[0])
    t0 = time.perf_counter()
    for i in range(N):
        o = jfn(i)
    jax.device_get(jax.tree.leaves(o)[0].ravel()[0])
    print(f"{name:44s} {(time.perf_counter()-t0)/N*1000:8.1f} ms", flush=True)


pre = jax.jit(lambda r, d: eng._preprocess(r, d, mz))
prep = pre(rj, dj)

@jax.jit
def render(s):
    return splat_ops.render_index_map(
        sm.prefix_view(s.map, B), se3.pose_inverse(s.pose), intr, H, W,
        3.0, 1 << 30, 5.0)
im = render(st)

# ---------------- clean ablations ----------------
mwork = sm.prefix_view(st.map, B)

def clean_taps(n_taps, wide):
    """Just the violation-count part of clean with n_taps taps."""
    def f(m, index_map, pose_inv):
        R = pose_inv[:3, :3]; t = pose_inv[:3, 3]
        lp = m.pos @ R.T + t
        lz = lp[:, 2]
        x = intr.fx * lp[:, 0] / jnp.where(lz != 0, lz, 1.) + intr.cx
        y = intr.fy * lp[:, 1] / jnp.where(lz != 0, lz, 1.) + intr.cy
        n_px = H * W
        packed = jnp.concatenate([
            index_map.pos.reshape(n_px, 3),
            index_map.conf.reshape(n_px, 1),
            index_map.init_time.reshape(n_px, 1),
            index_map.last_seen.reshape(n_px, 1),
            index_map.index.reshape(n_px, 1).astype(jnp.float32),
            jnp.zeros((n_px, 1), jnp.float32)], axis=1)
        count = jnp.zeros((m.capacity,), jnp.int32)
        if not wide:
            taps = half_pixel_taps_unique(x, y)[:n_taps]
            for ty, tx, mult in taps:
                linp = jnp.clip(ty, 0, H - 1) * W + jnp.clip(tx, 0, W - 1)
                rows = packed[linp]
                c1 = (rows[:, 6] >= 0) & (rows[:, 2] > lz)
                count = count + jnp.where(c1, mult, 0)
        else:
            # one wide table: 9 taps x 8 fields = 72 cols
            pimg = packed.reshape(H, W, 8)
            cols = []
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    pad = [(max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx)), (0, 0)]
                    pp_ = jnp.pad(pimg, pad)
                    cols.append(pp_[max(0, dy):max(0, dy)+H, max(0, dx):max(0, dx)+W])
            widetab = jnp.concatenate(cols, axis=-1).reshape(n_px, 72)
            ky = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 1)
            kx = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 1)
            rows = widetab[ky * W + kx]
            for k in range(9):
                r = rows[:, 8*k:8*k+8]
                c1 = (r[:, 6] >= 0) & (r[:, 2] > lz)
                count = count + jnp.where(c1, 1, 0)
        return count
    return jax.jit(f)

for n in (0, 1, 3, 9):
    timeit(f"clean-taps x{n}", lambda i, f=clean_taps(n, False): f(mwork, im, se3.pose_inverse(st.pose)))
timeit("clean-taps WIDE(1 gather)", lambda i, f=clean_taps(9, True): f(mwork, im, se3.pose_inverse(st.pose)))

@jax.jit
def just_compact(m):
    keep = m.conf > 0.5
    return sm.compact_self(m, keep)
timeit("compact_self", lambda i: just_compact(mwork))

@jax.jit
def full_clean(fm, i_m, p, s):
    return clean_ops.clean(fm, i_m, p.filt_depth, mz, jnp.uint8(0),
                           se3.pose_inverse(s.pose), intr, 3.0, 1 << 30,
                           10.0, 5.0, 3.0)
timeit("clean full", lambda i: full_clean(mwork, im, prep, st))

# ---------------- track ablations ----------------
mp = odo.build_model_pyramids(st.pred_vmap, st.pred_nmap, st.pred_rgb,
                              st.pose, 3, 6.0)
mpj = jax.jit(lambda s: odo.build_model_pyramids(
    s.pred_vmap, s.pred_nmap, s.pred_rgb, s.pose, 3, 6.0))
timeit("build_model_pyramids", lambda i: mpj(st))

fp = prep.frame_pyr

def mk_track(**kw):
    def f(t, R):
        return odo.get_incremental_transformation(
            t, R, fp, mp, fp.intensities, intr, **kw)
    return jax.jit(f)

t0j = st.pose[:3, 3]; R0j = st.pose[:3, :3]
timeit("track {10,5,4}+so3", lambda i, f=mk_track(): f(t0j, R0j))
timeit("track {10,5,4} noso3", lambda i, f=mk_track(use_so3=False): f(t0j, R0j))
timeit("track so3-only {0,0,0}", lambda i, f=mk_track(fast_odom=True, icp_weight=0.0, rgb_only=False): f(t0j, R0j))
timeit("track {4,0,0}eff noso3 (fast=3 L0)", lambda i, f=mk_track(use_so3=False, fast_odom=True): f(t0j, R0j))
timeit("track icp-only {10,5,4} noso3", lambda i, f=mk_track(use_so3=False, icp_weight=100.0): f(t0j, R0j))
timeit("track rgb-only {10,5,4} noso3", lambda i, f=mk_track(use_so3=False, rgb_only=True): f(t0j, R0j))

# ---------------- fuse ablations ----------------
@jax.jit
def just_fuse(s, i_m, p):
    return fuse_ops.fuse(sm.prefix_view(s.map, B), i_m, p.levels[0]["vmap"],
                         p.levels[0]["vmap"], p.levels[0]["nmap"], rj, mz,
                         jnp.uint8(0), s.pose, intr, 3.0, 1.0, 5.0)
timeit("fuse full", lambda i: just_fuse(st, im, prep))

slots = jax.random.randint(jax.random.PRNGKey(1), (H * W,), -1, B, jnp.int32)
vals = [jax.random.normal(jax.random.PRNGKey(2), (H * W,), jnp.float32),
        jax.random.normal(jax.random.PRNGKey(3), (H * W, 3), jnp.float32),
        jax.random.normal(jax.random.PRNGKey(4), (H * W, 3), jnp.float32),
        jax.random.normal(jax.random.PRNGKey(5), (H * W, 3), jnp.float32),
        jax.random.normal(jax.random.PRNGKey(6), (H * W,), jnp.float32)]

@jax.jit
def just_segsum(slots, vals):
    return sort_utils.segment_sum_dense(slots, slots >= 0, vals, B)
timeit("segment_sum_dense", lambda i: just_segsum(slots, vals))

@jax.jit
def just_searchsorted(sk):
    tg = jnp.arange(B + 1, dtype=jnp.int32)
    return jnp.searchsorted(sk, tg, method="sort")
sk = jnp.sort(jnp.where(slots >= 0, slots, B))
timeit("searchsorted(B+1 into 307k)", lambda i: just_searchsorted(sk))

# zbuffer parts
mv = sm.prefix_view(st.map, B)
lin = jax.random.randint(jax.random.PRNGKey(7), (B,), 0, H * W, jnp.int32)
zz = jax.random.uniform(jax.random.PRNGKey(8), (B,), jnp.float32, 0.1, 5.0)
ok = jnp.ones((B,), bool)

@jax.jit
def just_zbuf(lin, zz, ok):
    return sort_utils.zbuffer_render(lin, zz, ok, H * W)
timeit("zbuffer_render", lambda i: just_zbuf(lin, zz, ok))
timeit("render_index_map", lambda i: render(st))
