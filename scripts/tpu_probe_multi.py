"""Two-object path breakdown: engine stopwatch scopes + wall per frame.

Identifies whether the multi-object gap to static FPS is host-blocking
fetches (remote-tunnel RTT), host segmentation, or device compute.
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax

import bench


def main():
    from maskfusion_tpu.camera import CameraIntrinsics, Resolution
    from maskfusion_tpu.config import Config
    from maskfusion_tpu.engine import MaskFusion

    W, H = 640, 480
    n_warm, n_timed = 14, 16
    frames, (fx, fy, cx, cy) = bench.make_two_object_frames(
        W, H, n_warm + n_timed)
    cfg = Config(global_surfel_capacity=1 << 22,
                 object_surfel_capacity=1 << 19,
                 seg_method="maskfusion",
                 model_spawn_offset=2,
                 pipelined_multiobject=True)
    engine = MaskFusion(Resolution(W, H),
                        CameraIntrinsics(fx, fy, cx, cy), cfg)
    for f in frames[:n_warm]:
        engine.process_frame(f)
    engine.drain_pipeline()
    print("n_models:", len(engine.models),
          "windows:", [m.window for m in engine.models[1:]], flush=True)
    base_ms = dict(engine.stopwatch.timings_ms)
    base_n = dict(engine.stopwatch.counts)

    per_frame = []
    staged = engine.upload_frame(frames[n_warm])
    t0 = time.perf_counter()
    for nxt in frames[n_warm + 1:]:
        nxt_staged = engine.upload_frame(nxt)
        engine.process_frame(staged)
        staged = nxt_staged
        t1 = time.perf_counter()
        per_frame.append((t1 - t0) * 1000)
        t0 = t1
    engine.process_frame(staged)
    engine.drain_pipeline()
    jax.block_until_ready(engine.models[0].state.pose)
    t1 = time.perf_counter()
    per_frame.append((t1 - t0) * 1000)

    print("wall ms/frame:", [round(x, 1) for x in per_frame], flush=True)
    sw = engine.stopwatch
    for name in sorted(sw.timings_ms):
        tot = sw.timings_ms[name] - base_ms.get(name, 0.0)
        n = sw.counts[name] - base_n.get(name, 0)
        if n:
            print(f"{name:16s} n={n:3d} mean={tot / n:7.1f}", flush=True)


if __name__ == "__main__":
    main()
