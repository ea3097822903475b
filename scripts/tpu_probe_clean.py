"""Clean-pass internal breakdown (scalar outputs)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from maskfusion_tpu.camera import Resolution, CameraIntrinsics
from maskfusion_tpu.config import Config
from maskfusion_tpu.engine import MaskFusion
from maskfusion_tpu.frame import FrameData
from maskfusion_tpu.mapping import surfel_map as sm
from maskfusion_tpu.ops import splat as splat_ops, fuse as fuse_ops, clean as clean_ops
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
B = sm.choose_bucket(eng._last_count, glob.state.map.capacity)
st = glob.state
print("bucket:", B, flush=True)
time_delta = cfg.effective_time_delta()
TIME = 100.0
mz = jnp.zeros((H, W), jnp.uint8)
prep = eng._preprocess(rj, dj, mz)
pose_inv = se3.pose_inverse(st.pose)
work = sm.prefix_view(st.map, B)
im1 = splat_ops.render_index_map(work, pose_inv, intr, H, W, TIME,
                                 time_delta, cfg.depth_cutoff)
fres = fuse_ops.fuse(work, im1, prep.vmap_raw, prep.levels[0]["vmap"],
                     prep.levels[0]["nmap"], rj, mz, jnp.uint8(0), st.pose,
                     intr, TIME, 1.0, cfg.depth_cutoff, checkerboard=True,
                     parity=0, merge_z_thresh=cfg.surfel_merge_z_thresh)
fm = jax.block_until_ready(fres.map)
im1 = jax.block_until_ready(im1)


def timeit(name, jfn, N=48):
    o = jfn()
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for i in range(N):
        o = jfn()
    jax.device_get(o)
    print(f"{name:38s} {(time.perf_counter()-t0)/N*1000:8.2f} ms", flush=True)


conf_threshold = cfg.conf_threshold_global


def stage(m, index_map, depth_input, upto):
    mask = mz
    R = pose_inv[:3, :3]
    t = pose_inv[:3, 3]
    lp = m.pos @ R.T + t
    ln = m.normal @ R.T
    ln = ln / jnp.maximum(jnp.linalg.norm(ln, axis=-1, keepdims=True), 1e-20)
    lz = lp[:, 2]
    x = intr.fx * lp[:, 0] / jnp.where(lz != 0, lz, 1.0) + intr.cx
    y = intr.fy * lp[:, 1] / jnp.where(lz != 0, lz, 1.0) + intr.cy
    time_ = jnp.asarray(TIME, jnp.float32)
    in_view = (((time_ - m.last_seen) < time_delta)
               & (lz > 0) & (x > 0) & (y > 0) & (x < W) & (y < H))
    if upto == "project":
        return jnp.sum(in_view) + jnp.sum(x) + jnp.sum(ln)

    def hi_lo(a):
        hi = a.astype(jnp.float16)
        lo = (a - hi.astype(jnp.float32)).astype(jnp.float16)
        return hi, lo

    import jax.lax as lax
    px_ray_x = (lax.broadcasted_iota(jnp.float32, (H, W), 1) - intr.cx) / intr.fx
    px_ray_y = (lax.broadcasted_iota(jnp.float32, (H, W), 0) - intr.cy) / intr.fy
    c_z = index_map.pos[..., 2]
    z_hi, z_lo = hi_lo(c_z)
    it_hi, it_lo = hi_lo(index_map.init_time)
    rx = (index_map.pos[..., 0] - px_ray_x * c_z).astype(jnp.float16)
    ry = (index_map.pos[..., 1] - px_ray_y * c_z).astype(jnp.float16)
    flag = ((index_map.index >= 0).astype(jnp.float16)
            + 2.0 * (index_map.conf > conf_threshold).astype(jnp.float16)
            + 4.0 * (index_map.last_seen == time_).astype(jnp.float16))
    fields = jnp.stack([z_hi, z_lo, it_hi, it_lo, rx, ry, flag], axis=-1)
    taps = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            pad = [(max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx)), (0, 0)]
            p = jnp.pad(fields, pad)
            taps.append(p[max(0, dy):max(0, dy) + H, max(0, dx):max(0, dx) + W])
    wide = jnp.concatenate(taps + [jnp.zeros((H, W, 1), jnp.float16)],
                           axis=-1).reshape(H * W, 64)
    if upto == "table":
        return jnp.sum(wide.astype(jnp.float32))
    kx = jnp.floor(x)
    ky = jnp.floor(y)
    kxi = jnp.clip(kx.astype(jnp.int32), 0, W - 1)
    kyi = jnp.clip(ky.astype(jnp.int32), 0, H - 1)
    rows = wide[kyi * W + kxi]
    if upto == "gather":
        return jnp.sum(rows.astype(jnp.float32)) + jnp.sum(in_view)
    fx_lo = (x - kx) < 0.5
    fy_lo = (y - ky) < 0.5
    mx = (jnp.where(fx_lo, 2, 1), jnp.full_like(kxi, 2), jnp.where(fx_lo, 0, 1))
    my = (jnp.where(fy_lo, 2, 1), jnp.full_like(kyi, 2), jnp.where(fy_lo, 0, 1))
    count = jnp.zeros((m.capacity,), jnp.int32)
    zcount = jnp.zeros((m.capacity,), jnp.int32)
    for k in range(9):
        dy, dx = k // 3 - 1, k % 3 - 1
        r = rows[:, 7 * k:7 * k + 7]
        c_z_s = r[:, 0].astype(jnp.float32) + r[:, 1].astype(jnp.float32)
        c_it = r[:, 2].astype(jnp.float32) + r[:, 3].astype(jnp.float32)
        fl = r[:, 6].astype(jnp.int32)
        c_live = (fl & 1) > 0
        c_conf_ok = (fl & 2) > 0
        c_ls_now = (fl & 4) > 0
        tap_x = (jnp.clip(kxi + dx, 0, W - 1).astype(jnp.float32) - intr.cx) / intr.fx
        tap_y = (jnp.clip(kyi + dy, 0, H - 1).astype(jnp.float32) - intr.cy) / intr.fy
        c_x = tap_x * c_z_s + r[:, 4].astype(jnp.float32)
        c_y = tap_y * c_z_s + r[:, 5].astype(jnp.float32)
        mult = my[k // 3] * mx[k % 3]
        base = in_view & c_live & c_conf_ok & (c_z_s > lz)
        xy_dist = jnp.sqrt((c_x - lp[:, 0]) ** 2 + (c_y - lp[:, 1]) ** 2)
        c1 = base & (c_it < m.init_time - 0.5) & (c_z_s - lz < 0.01) & (
            xy_dist < m.radius * 1.4)
        c2 = base & c_ls_now & (c_z_s - lz > 0.01) & (jnp.abs(ln[:, 2]) > 0.85)
        count = count + jnp.where(c1, mult, 0)
        zcount = zcount + jnp.where(c2, mult, 0)
    return jnp.sum(count) + jnp.sum(zcount)


for s in ("project", "table", "gather", "counts"):
    timeit(f"clean upto {s}",
           lambda f=jax.jit(lambda m, im, d, s=s: stage(m, im, d, s)):
           f(fm, im1, prep.filt_depth))

timeit("clean FULL",
       lambda f=jax.jit(lambda m, im, p: jnp.sum(clean_ops.clean(
           m, im, p.filt_depth, mz, jnp.uint8(0), pose_inv, intr, TIME,
           time_delta, conf_threshold, cfg.depth_cutoff,
           cfg.outlier_coefficient,
           unstable_time_limit=cfg.unstable_time_limit).map.conf)):
       f(fm, im1, prep))
