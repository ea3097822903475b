"""DCE-prefix bisect INSIDE combined_predict (13.4 ms in-context): level-0
tap scan vs coarse scan vs revalidation row-gather vs attribute row-gather.
Run alone on the TPU."""
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
from maskfusion_tpu.ops import splat as splat_ops
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
work = sm.prefix_view(st.map, B)
pose_inv = jax.block_until_ready(jax.jit(se3.pose_inverse)(st.pose))
TIME, td = 100.0, cfg.effective_time_delta()
im1 = jax.block_until_ready(jax.jit(
    lambda m, pi: splat_ops.render_index_map(
        m, pi, intr, H, W, TIME, td, cfg.depth_cutoff))(work, pose_inv))
imc = jax.block_until_ready(jax.jit(
    lambda m, pi: splat_ops.render_index_map(
        m, pi, intr.level(2), H >> 2, W >> 2, TIME, td,
        cfg.depth_cutoff))(work, pose_inv))


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


nothing = jax.jit(lambda x: x + 1.0)
timeit("floor", lambda: nothing(jnp.float32(1.0)))

# stage toggles via a copied-out reimplementation would drift; instead use
# the public entry with coarse on/off and window sizes to decompose:
p_w0 = jax.jit(lambda im: ssum(splat_ops.combined_predict(
    im, intr, cfg.depth_cutoff, window=0).vmap))
timeit("predict window=0 (1 tap, no coarse)", lambda: p_w0(im1))
p_w1 = jax.jit(lambda im: ssum(splat_ops.combined_predict(
    im, intr, cfg.depth_cutoff, window=1).vmap))
timeit("predict window=1 (9 taps, no coarse)", lambda: p_w1(im1))
p_nc = jax.jit(lambda im: ssum(splat_ops.combined_predict(
    im, intr, cfg.depth_cutoff).vmap))
timeit("predict window=2 (25 taps, no coarse)", lambda: p_nc(im1))
p_c = jax.jit(lambda im, ic: ssum(splat_ops.combined_predict(
    im, intr, cfg.depth_cutoff, coarse=(ic, 2)).vmap))
timeit("predict window=2 + coarse", lambda: p_c(im1, imc))
