"""Diagnose the two-object bench regression (0.051 FPS, 2026-08-18).

Runs the exact bench_two_objects flow with jax_log_compiles=True and a
per-frame wall-clock print, so a per-frame recompile storm vs a slow
steady-state frame is immediately distinguishable.  Run alone on the TPU.
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import sys
import time

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402

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
    models = [(m.model_id, m.surfel_count, m.window) for m in engine.models]
    print(f"frame {i:3d}  {dt:8.1f} ms  models={models}", flush=True)

engine.drain_pipeline()
print("done", flush=True)
