"""Full-capacity soak: reference-default 9.4M global surfels (VERDICT #8).

Runs the static engine at the reference's compile-time capacity
(3072^2 = 9_437_184, Core/CMakeLists.txt:27) over a long wide-sweep
synthetic sequence so the map grows through multiple bucket steps, and
reports count/bucket growth, stage behaviour and throughput.

    python scripts/soak_capacity.py [--frames 150]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=150)
    p.add_argument("--capacity", type=int, default=3072 * 3072)
    args = p.parse_args()

    import numpy as np
    from maskfusion_tpu.camera import Resolution, CameraIntrinsics
    from maskfusion_tpu.config import Config
    from maskfusion_tpu.engine import MaskFusion
    from maskfusion_tpu.frame import FrameData
    from maskfusion_tpu.mapping import surfel_map as sm

    W, H = 640, 480
    cfg = Config(static_mode=True, global_surfel_capacity=args.capacity)
    eng = MaskFusion(Resolution(W, H),
                     CameraIntrinsics(528.0, 528.0, 320.0, 240.0), cfg)

    # wide-sweep frames: the camera pans so most of each frame is NEW
    # geometry -> the map grows by O(100k) surfels per frame
    u, v = np.meshgrid(np.arange(W), np.arange(H))

    def frame(i):
        ph = i * 0.35
        depth = (1.6 + 0.0004 * u + 0.0003 * v
                 + 0.25 * np.sin(u * 0.013 + ph) * np.cos(v * 0.011 + 0.3 * ph)
                 ).astype(np.float32)
        rgb = np.stack([(u * 3 + 11 * i) % 256, (v * 2 + 5 * i) % 256,
                        (u + v + 7 * i) % 256], -1).astype(np.uint8)
        return FrameData(rgb=rgb, depth=depth, timestamp=float(i))

    log = []
    buckets = set()
    t0 = time.perf_counter()
    for i in range(args.frames):
        eng.process_frame(frame(i))
        if i % 10 == 9:
            d = eng.flush_diagnostics()
            cnt = eng._last_count
            b = sm.choose_bucket(cnt, args.capacity,
                                 current=eng.models[0].last_bucket)
            buckets.add(b)
            dt = time.perf_counter() - t0
            log.append({"frame": i + 1, "count": int(cnt), "bucket": int(b),
                        "elapsed_s": round(dt, 1)})
            print(f"frame {i+1:4d}: surfels {cnt:9d} bucket {b:9d} "
                  f"fps_so_far {(i+1)/dt:5.2f}", flush=True)
    total = time.perf_counter() - t0
    print(json.dumps({
        "capacity": args.capacity,
        "frames": args.frames,
        "final_count": log[-1]["count"] if log else 0,
        "buckets_visited": sorted(buckets),
        "fps": round(args.frames / total, 2),
    }))


if __name__ == "__main__":
    main()
