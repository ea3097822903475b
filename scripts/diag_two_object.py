"""Diagnose the two-object bench regression (0.051 FPS, 2026-08-18).

Runs the exact bench_two_objects flow with jax_log_compiles=True and a
per-frame wall-clock print, so a per-frame recompile storm vs a slow
steady-state frame is immediately distinguishable.  Run alone on the TPU.

In pipelined mode dt measures host dispatch only; the per-frame print uses
the non-blocking count_est (a blocking surfel_count fetch is ~230 ms RTT
per model and would serialize the very pipeline under test).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402

# env-var route is silently ignored (sitecustomize imports jax first —
# CLAUDE.md); configure the persistent cache through jax.config
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_log_compiles", True)

import bench  # noqa: E402
from maskfusion_tpu.camera import CameraIntrinsics, Resolution  # noqa: E402
from maskfusion_tpu.config import Config  # noqa: E402
from maskfusion_tpu.engine import MaskFusion  # noqa: E402

W, H = 640, 480
N = 24
frames, (fx, fy, cx, cy) = bench.make_two_object_frames(W, H, N)
cfg = Config(global_surfel_capacity=1 << 22,
             object_surfel_capacity=1 << 19,
             seg_method="maskfusion",
             model_spawn_offset=2,
             pipelined_multiobject=True)
engine = MaskFusion(Resolution(W, H), CameraIntrinsics(fx, fy, cx, cy), cfg)

for i, f in enumerate(frames):
    t0 = time.perf_counter()
    engine.process_frame(f)
    dt = (time.perf_counter() - t0) * 1000
    models = [(m.model_id, m.count_est, m.window) for m in engine.models]
    print(f"frame {i:3d}  {dt:8.1f} ms  models={models}", flush=True)

engine.drain_pipeline()
print("counts:", [(m.model_id, m.surfel_count) for m in engine.models],
      flush=True)
print("done", flush=True)
