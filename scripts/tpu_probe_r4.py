"""Round-3 session-2 probe: current static stage budget + object-window costs.

Scalar-probe methodology (CLAUDE.md): N pipelined dispatches returning ONE
scalar + one final device_get; floor ~1.5 ms/iter subtracted mentally.
"""
import sys, time
import traceback
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
# env-var route is silently ignored (sitecustomize imports jax first)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
from maskfusion_tpu.camera import Resolution, CameraIntrinsics
from maskfusion_tpu.config import Config
from maskfusion_tpu.engine import MaskFusion
from maskfusion_tpu.frame import FrameData
from maskfusion_tpu.mapping import surfel_map as sm
from maskfusion_tpu.ops import (splat as splat_ops, fuse as fuse_ops,
                                clean as clean_ops, fill_in as fill_ops,
                                preprocess as pp)
from maskfusion_tpu.tracking import odometry as odo
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
glob = eng.models[0]
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
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


nothing = jax.jit(lambda x: x + 1.0)
timeit("nothing (floor)", lambda: nothing(jnp.float32(1.0)))

# ---- end-to-end fused static step (no donation so it can repeat) ----
fss = jax.jit(eng._fused_static_step.__wrapped__,
              static_argnames=("bucket", "parity", "compact"))


def step_consume(out):
    # consume EVERY output field: summing only the pose lets XLA dead-code
    # eliminate the whole fuse/clean/predict subgraph (a pose-only probe
    # measured 20.6 ms against the bench's 74 ms frame — it was timing
    # preprocess+track alone)
    s = out[0]
    return ssum(s.map.conf, s.map.pos, s.map.last_seen, s.map.count,
                s.pose, s.pred_vmap, s.pred_nmap, s.pred_rgb)


step_s = jax.jit(lambda s, r, d: step_consume(
    fss(s, r, d, TIME, bucket=B, parity=0, compact=False)))
timeit("fused_static_step (compact=False)",
       lambda: step_s(st, rj, dj))
step_sc = jax.jit(lambda s, r, d: step_consume(
    fss(s, r, d, TIME, bucket=B, parity=0, compact=True)))
timeit("fused_static_step (compact=True)",
       lambda: step_sc(st, rj, dj))

# ---- stage decomposition ----
prep = jax.block_until_ready(eng._preprocess(rj, dj, mz))
prep_s = jax.jit(lambda r, d: ssum(eng._preprocess.__wrapped__(r, d, mz)
                                   if hasattr(eng._preprocess, "__wrapped__")
                                   else eng._preprocess(r, d, mz)))
timeit("preprocess", lambda: prep_s(rj, dj))

track_s = jax.jit(lambda s, p: ssum(
    eng._track.__wrapped__(s, p, jnp.uint8(0)).pose))
timeit("track (model pyr + GN)", lambda: track_s(st, prep))

pose_inv = jax.block_until_ready(jax.jit(se3.pose_inverse)(st.pose))
work = sm.prefix_view(st.map, B)
render_s = jax.jit(lambda m, pi: ssum(splat_ops.render_index_map(
    m, pi, intr, H, W, TIME, time_delta, cfg.depth_cutoff).index))
timeit("render im1 (VGA)", lambda: render_s(work, pose_inv))

im1 = jax.block_until_ready(jax.jit(
    lambda m, pi: splat_ops.render_index_map(
        m, pi, intr, H, W, TIME, time_delta, cfg.depth_cutoff))(
            work, pose_inv))

fuse_f = lambda m, im, p, r: fuse_ops.fuse(
    m, im, p.vmap_raw, p.levels[0]["vmap"], p.levels[0]["nmap"], r, mz,
    jnp.uint8(0), st.pose, intr, TIME, 1.0, cfg.depth_cutoff,
    checkerboard=True, parity=0, merge_z_thresh=cfg.surfel_merge_z_thresh)
fuse_s = jax.jit(lambda m, im, p, r: ssum(fuse_f(m, im, p, r).map))
timeit("fuse", lambda: fuse_s(work, im1, prep, rj))

fres = jax.block_until_ready(jax.jit(fuse_f)(work, im1, prep, rj))

conf_px = sm.pixel_confidence(H, W, intr, 1.0)
patch_s = jax.jit(lambda im, fm, npx, p, r: ssum(
    splat_ops.patch_index_map(
        im, fm, npx, p.vmap_raw, p.levels[0]["nmap"], conf_px, r,
        sm.radius_from_depth(p.levels[0]["vmap"][..., 2],
                             p.levels[0]["nmap"][..., 2], intr),
        pose_inv, TIME, work.count).index))
timeit("patch_index_map (incremental im2)",
       lambda: patch_s(im1, fres.map, fres.new_pixels, prep, rj))

clean_f = lambda fm, im, p: clean_ops.clean(
    fm, im, p.filt_depth, mz, jnp.uint8(0), pose_inv, intr, TIME,
    time_delta, cfg.conf_threshold_global, cfg.depth_cutoff,
    cfg.outlier_coefficient, unstable_time_limit=cfg.unstable_time_limit,
    compact=False)
clean_s = jax.jit(lambda fm, im, p: ssum(clean_f(fm, im, p).map))
timeit("clean (compact=False)", lambda: clean_s(fres.map, im1, prep))
clean_fc = lambda fm, im, p: clean_ops.clean(
    fm, im, p.filt_depth, mz, jnp.uint8(0), pose_inv, intr, TIME,
    time_delta, cfg.conf_threshold_global, cfg.depth_cutoff,
    cfg.outlier_coefficient, unstable_time_limit=cfg.unstable_time_limit,
    compact=True)
clean_sc = jax.jit(lambda fm, im, p: ssum(clean_fc(fm, im, p).map))
timeit("clean (compact=True)", lambda: clean_sc(fres.map, im1, prep))

cres = jax.block_until_ready(jax.jit(clean_f)(fres.map, im1, prep))

coarse_s = jax.jit(lambda m, pi: ssum(splat_ops.render_index_map(
    m, pi, intr.level(2), H >> 2, W >> 2, TIME, time_delta,
    cfg.depth_cutoff).index))
timeit("render coarse (1/4)", lambda: coarse_s(cres.map, pose_inv))

im_coarse = jax.block_until_ready(jax.jit(
    lambda m, pi: splat_ops.render_index_map(
        m, pi, intr.level(2), H >> 2, W >> 2, TIME, time_delta,
        cfg.depth_cutoff))(cres.map, pose_inv))

pred_s = jax.jit(lambda im, imc: ssum(splat_ops.combined_predict(
    im, intr, cfg.depth_cutoff, coarse=(imc, 2)).vmap))
timeit("combined_predict", lambda: pred_s(im1, im_coarse))

pred = jax.block_until_ready(jax.jit(
    lambda im, imc: splat_ops.combined_predict(
        im, intr, cfg.depth_cutoff, coarse=(imc, 2)))(im1, im_coarse))
fill_s = jax.jit(lambda pr, r, p: ssum(fill_ops.fill_in(
    pr, r, p.levels[0]["vmap"], p.levels[0]["nmap"]).vmap))
timeit("fill_in", lambda: fill_s(pred, rj, prep))

print("---- object window (OW=320, bucket 65536) ----", flush=True)
OB = 1 << 16
OW = 320
# build a small object map by reusing a prefix of the global map
obj_map = sm.prefix_view(st.map, OB)
intr_c = CameraIntrinsics(intr.fx, intr.fy, intr.cx - 160.0, intr.cy - 80.0)
orender_s = jax.jit(lambda m, pi: ssum(splat_ops.render_index_map(
    m, pi, intr_c, OW, OW, TIME, time_delta, cfg.depth_cutoff).index))
timeit("obj render im1 (320^2, 64k surfels)",
       lambda: orender_s(obj_map, pose_inv))

ofcp = jax.jit(
    eng._fuse_clean_predict_obj_win.__wrapped__,
    static_argnames=("bucket", "parity"))
ofcp_s = jax.jit(lambda s, p, r: ssum(ofcp(
    s, p, r, mz, jnp.eye(4), TIME, jnp.uint8(1), 9.0, 3.0, 1.0,
    jnp.int32(80), jnp.int32(160), OB, 0).map.count))
ost = st._replace(map=obj_map)
try:
    timeit("obj fuse_clean_predict_win (1 obj)",
           lambda: ofcp_s(ost, prep, rj))
except Exception as e:
    print("obj fcp probe failed:", e, flush=True); traceback.print_exc()

# ---- pipelined two-object stages (the multi-object bench's dispatches) ----
print("---- pipelined stages: glob + 2 objects ----", flush=True)
from maskfusion_tpu.engine import MapState  # noqa: E402

fill = jax.block_until_ready(jax.jit(
    lambda im, imc: splat_ops.combined_predict(
        im, intr, cfg.depth_cutoff, coarse=(imc, 2)))(im1, im_coarse))
obj_state = MapState(
    map=obj_map, pose=st.pose, last_delta=jnp.eye(4, dtype=jnp.float32),
    pred_vmap=fill.vmap, pred_nmap=fill.nmap,
    pred_rgb=fill.rgb.astype(jnp.float32),
    so3_intensity=st.so3_intensity)
obj_aux = jnp.asarray([[1.0, 80.0, 160.0], [2.0, 80.0, 160.0]], jnp.float32)
ids_vec = jnp.asarray([0.0, 1.0, 2.0], jnp.float32)

# the pipelined device stage references self.segmenter._edge_binary —
# needs a multi-object engine (the static eng above has segmenter=None)
cfg_mo = Config(static_mode=False, seg_method="maskfusion",
                global_surfel_capacity=1 << 22)
eng_mo = MaskFusion(Resolution(W, H), intr, cfg_mo)
pds = eng_mo._pipelined_device_stage
pds_s = jax.jit(lambda gs, o1, o2, r, d: ssum(*(
    lambda out: (out[3], out[4], out[5], out[0].filt_depth))(
        pds(gs, (o1, o2), obj_aux, ids_vec, r, d, mz, TIME,
            glob_bucket=B, obj_bucket=OB, windowed=True))))
dj16 = jnp.asarray((d0 * 1000).astype(np.uint16))
try:
    timeit("pipelined_device_stage (glob+2 obj win)",
           lambda: pds_s(st, obj_state, obj_state, rj, dj16))
except Exception as e:
    print("pds probe failed:", e, flush=True); traceback.print_exc()
pds0_s = jax.jit(lambda gs, r, d: ssum(*(
    lambda out: (out[3], out[4], out[5], out[0].filt_depth))(
        pds(gs, (), jnp.zeros((0, 3), jnp.float32),
            ids_vec[:1], r, d, mz, TIME,
            glob_bucket=B, obj_bucket=OB, windowed=False))))
try:
    timeit("pipelined_device_stage (glob only)",
           lambda: pds0_s(st, rj, dj16))
except Exception as e:
    print("pds0 probe failed:", e, flush=True); traceback.print_exc()

pfsw = jax.jit(eng._pipelined_fuse_stage.__wrapped__,
               static_argnames=("glob_bucket", "obj_bucket", "parity",
                                "windowed"))
obj_params = jnp.asarray([[1.0, 3.0, 3.0, 1.0, 80.0, 160.0],
                          [2.0, 3.0, 3.0, 1.0, 80.0, 160.0]], jnp.float32)
prev3 = jnp.stack([st.pose] * 3)
seg2 = jnp.zeros((H, W), jnp.uint8)


def consume_fuse(out):
    ng, objs_out = out
    parts = [ng.map.pos, ng.map.conf, ng.pose]
    for o in objs_out:
        parts.extend([o.map.pos, o.map.conf, o.pose])
    return ssum(*parts)


pfs_s = jax.jit(lambda gs, o1, o2, p, r: consume_fuse(
    pfsw(gs, (o1, o2), p, r, seg2, prev3, TIME, obj_params,
         glob_bucket=B, obj_bucket=OB, parity=0, windowed=True)))
try:
    timeit("pipelined_fuse_stage (glob+2 obj win)",
           lambda: pfs_s(st, obj_state, obj_state, prep, rj))
except Exception as e:
    print("pfs probe failed:", e, flush=True); traceback.print_exc()
pfs0_s = jax.jit(lambda gs, p, r: consume_fuse(
    pfsw(gs, (), p, r, seg2, prev3[:1], TIME,
         jnp.zeros((0, 6), jnp.float32),
         glob_bucket=B, obj_bucket=OB, parity=0, windowed=False)))
try:
    timeit("pipelined_fuse_stage (glob only)",
           lambda: pfs0_s(st, prep, rj))
except Exception as e:
    print("pfs0 probe failed:", e, flush=True); traceback.print_exc()

# upload-bandwidth floor: stage one frame (u8 rgb + u16 depth) and sum it
up_s = jax.jit(lambda r, d: jnp.sum(r.astype(jnp.float32))
               + jnp.sum(d.astype(jnp.float32)))
r_host = np.asarray(r0)
d_host = (d0 * 1000).astype(np.uint16)


def upload_once():
    rr = jax.device_put(r_host)
    dd = jax.device_put(d_host)
    return up_s(rr, dd)


timeit("frame upload (0.9 MB u8 + 0.6 MB u16)", lambda: upload_once(), N=24)
