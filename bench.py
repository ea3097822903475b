"""Headline benchmark: SLAM FPS at 640x480 on one TPU chip.

Runs the static-mode pipeline (preprocess -> track -> fuse -> clean ->
predict) on synthetic frames at the reference's working resolution and
reports steady-state frames/second against the 30 FPS real-time target
(BASELINE.md: 33.3 ms/frame governor, GUI/MainController.cpp:487-489).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import signal
import sys
import time

import numpy as np


def _scrub_truncated_cache_entries(cache_dir="/root/repo/.jax_cache"):
    """Delete compile-cache entries truncated by a mid-compile kill: a
    half-written zstd frame errors ("did not decompress full frame") on
    every later load and forces a 90-230 s remote recompile each process
    start (observed 2026-08-19).  Full-decompress scan is ~ms per entry."""
    try:
        import zstandard
    except ImportError:
        return
    if not os.path.isdir(cache_dir):
        return
    for name in os.listdir(cache_dir):
        path = os.path.join(cache_dir, name)
        if not os.path.isfile(path):
            continue
        try:
            with open(path, "rb") as f:
                reader = zstandard.ZstdDecompressor().stream_reader(f)
                while reader.read(1 << 20):
                    pass
        except Exception:
            try:
                os.unlink(path)
                print(f"scrubbed truncated cache entry {name}",
                      file=sys.stderr)
            except OSError:
                pass


def _enable_compile_cache():
    """Persistent XLA compile cache: axon TPU compiles are remote and slow
    (~20-40 s cold), but cache hits load in ~0.3 s even cross-process.
    sitecustomize imports jax before env vars could apply, so configure
    through jax.config (env-var route is silently ignored)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


_scrub_truncated_cache_entries()
_enable_compile_cache()

BASELINE_FPS = 30.0

# Wall-clock discipline (round 4 lesson: the driver's bench run hit its
# timeout inside the optional NN bench, so the final static re-print never
# happened and the recorded headline was the lower two-object line).  The
# optional benches only START while elapsed < budget, and a SIGTERM from
# `timeout` flushes the already-measured headline before dying.
_T_START = time.monotonic()
_BUDGET_S = float(os.environ.get("MFT_BENCH_BUDGET", "600"))
_HEADLINE = None


def _elapsed():
    return time.monotonic() - _T_START


def _over_budget(label):
    if _elapsed() >= _BUDGET_S:
        print(f"skipping {label}: elapsed {_elapsed():.0f}s >= budget "
              f"{_BUDGET_S:.0f}s", file=sys.stderr)
        return True
    return False


def _flush_headline_and_exit(signum, frame):
    if _HEADLINE is not None:
        print(json.dumps(_HEADLINE), flush=True)
        os._exit(0)
    os._exit(124)


signal.signal(signal.SIGTERM, _flush_headline_and_exit)


def make_frames(width, height, n):
    from maskfusion_tpu.frame import FrameData

    u, v = np.meshgrid(np.arange(width), np.arange(height))
    frames = []
    for i in range(n):
        depth = (
            1.5 + 0.0004 * u + 0.0003 * v
            + 0.08 * np.sin(u * 0.03 + i * 0.02) * np.cos(v * 0.04)
        ).astype(np.float32)
        # uint16 millimetres: the sensor wire format (KLG/TUM-PNG); the
        # engine uploads it raw (0.6 MB vs 1.2 MB) and converts on device
        depth_mm = np.round(depth * 1000.0).astype(np.uint16)
        rgb = np.stack(
            [(u * 3 + 5 * i) % 256, (v * 2) % 256, (u + v) % 256], -1
        ).astype(np.uint8)
        frames.append(FrameData(rgb=rgb, depth=depth_mm, timestamp=float(i)))
    return frames


def _prewarm_boxed(engine, rungs, budget_s):
    """prewarm_next_buckets in a killable daemon thread: a wedged remote
    compile service hangs a single .compile() RPC indefinitely (observed
    2026-08-20 ~10:25 — threads futex-parked for 40+ min), and the budget
    check inside prewarm only runs BETWEEN variants.  If the thread misses
    its join deadline the bench proceeds to measure with warm-cache graphs
    only (compilation is compiler-server work, not device work, so a
    still-pending RPC cannot contend the measurement).  MFT_BENCH_PREWARM=0
    skips entirely."""
    if os.environ.get("MFT_BENCH_PREWARM", "1") == "0":
        return None
    import threading
    out = {}

    def go():
        try:
            out["n"] = engine.prewarm_next_buckets(rungs=rungs,
                                                   budget_s=budget_s)
        except Exception as e:                  # pragma: no cover
            out["err"] = repr(e)

    th = threading.Thread(target=go, daemon=True, name="mft-prewarm")
    th.start()
    th.join(budget_s + min(30.0, budget_s))
    if th.is_alive():
        print("prewarm wedged (remote compile hang) — measuring with "
              "warm-cache graphs only", file=sys.stderr)
        return None
    if "err" in out:
        print(f"prewarm failed: {out['err']}", file=sys.stderr)
        return None
    print(f"prewarmed {out.get('n', 0)} growth-rung graph variants",
          file=sys.stderr)
    return out.get("n")


def make_two_object_frames(width, height, n):
    """Co-Fusion-style synthetic multi-object scene: textured wavy
    background + TWO independently moving textured patches, rendered with
    per-pixel labels (MaskFusion's headline mode, MaskFusion.cpp:200-607)."""
    import numpy as np

    from maskfusion_tpu.frame import FrameData
    from maskfusion_tpu.tools import make_sequence as ms

    pts_bg, cols_bg, pts_o1, cols_o1, _ = ms.make_points(width)
    # second object: recoloured copy of the patch, offset in x/y
    pts_o2 = pts_o1 + np.array([-0.55, 0.18, 0.05], np.float32)
    cols_o2 = cols_o1[:, ::-1]
    labels = np.concatenate([
        np.zeros(len(pts_bg), np.uint8),
        np.full(len(pts_o1), 1, np.uint8),
        np.full(len(pts_o2), 2, np.uint8)])
    cols = np.concatenate([cols_bg, cols_o1, cols_o2])
    fx = fy = 0.825 * width
    cx, cy = width / 2.0, height / 2.0
    frames = []
    for i in range(n):
        s = i / max(n - 1, 1)
        cam = ms.camera_pose(0.25 * s)
        off1 = np.array([0.10 * np.sin(2 * np.pi * s), 0.0, 0.0], np.float32)
        off2 = np.array([0.0, 0.06 * np.sin(2 * np.pi * s + 1.0), 0.0],
                        np.float32)
        pts = np.concatenate([pts_bg, pts_o1 + off1, pts_o2 + off2])
        rgb, depth, lab = ms.render(pts, cols, cam, fx, fy, cx, cy,
                                    width, height, labels)
        depth_mm = np.round(depth * 1000.0).astype(np.uint16)
        frames.append(FrameData(rgb=rgb, depth=depth_mm, mask=lab,
                                class_ids=[0, 7, 8], timestamp=float(i)))
    return frames, (fx, fy, cx, cy)


def bench_two_objects():
    """Multi-object SLAM FPS: full per-frame segmentation + 2 object
    models + global model, pipelined engine."""
    from maskfusion_tpu.camera import CameraIntrinsics, Resolution
    from maskfusion_tpu.config import Config
    from maskfusion_tpu.engine import MaskFusion

    W, H = 640, 480
    n_warm, n_timed, n_reps = 14, 12, 3
    frames, (fx, fy, cx, cy) = make_two_object_frames(
        W, H, n_warm + n_timed * n_reps)
    cfg = Config(global_surfel_capacity=1 << 22,
                 object_surfel_capacity=1 << 19,
                 seg_method="maskfusion",
                 model_spawn_offset=2,
                 pipelined_multiobject=True,
                 # pin the object-axis size class to 2 from frame 1: the
                 # whole run (0, 1 or 2 live objects) uses ONE device-stage
                 # and ONE fuse-stage graph per parity — a cold start
                 # compiles 3 big graphs instead of ~10 (90-230 s each on
                 # the remote transport)
                 min_object_slots=2)
    # pipeline_depth stays at the config default (4): the host dispatches
    # ~10x faster than the device computes, so the in-flight queue SITS at
    # the cap in steady state and the cap IS the fuse-segmentation lag.  A
    # depth-12 run measured the same FPS (device-bound either way) but let
    # the stale masks smear moving objects into the global map — phantom
    # model spawns on the smeared regions.
    engine = MaskFusion(Resolution(W, H),
                        CameraIntrinsics(fx, fy, cx, cy), cfg)
    for i, f in enumerate(frames[:n_warm]):
        engine.process_frame(f)
        if i % 4 == 3:
            # drain during warmup so spawn/window lifecycle converges and
            # every jit variant compiles before the clock starts
            engine.drain_pipeline()
    engine.drain_pipeline()
    n_models = len(engine.models)
    # AOT-compile the next bucket growth rungs OUT of the timed windows: at
    # VGA the global map crosses its 262144->524288 pow2 rung mid-run, and
    # on a cold persistent cache that compile (90-230 s remote) lands inside
    # the measurement — the round-5 cold-cache run recorded 0.07 FPS for a
    # steady state of ~8.5 because of exactly two such compiles
    _prewarm_boxed(engine, rungs=2,
                   budget_s=max(60.0, _BUDGET_S - _elapsed() - 300.0))

    import jax
    fps_reps = []
    base = n_warm
    for rep in range(3):
        window = frames[base + rep * n_timed: base + (rep + 1) * n_timed]
        t0 = time.perf_counter()
        staged = engine.upload_frame(window[0])
        for nxt in window[1:]:
            nxt_staged = engine.upload_frame(nxt)
            engine.process_frame(staged)
            staged = nxt_staged
        engine.process_frame(staged)
        engine.drain_pipeline()
        jax.block_until_ready(engine.models[0].state.pose)
        total = time.perf_counter() - t0
        fps_reps.append(n_timed / total)
    # median of 3 windows: robust to one window absorbing a residual
    # compile or a transport stall (the static bench medians the same way)
    fps = sorted(fps_reps)[len(fps_reps) // 2]
    print(json.dumps({
        "metric": "slam_fps_640x480_two_objects",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
        "n_models": n_models,
        "reps": [round(f, 3) for f in fps_reps],
    }))


def bench_nn_in_loop():
    """SLAM + async Mask R-CNN sharing the chip: the reference's NN lane
    (MaskRCNN.cpp:178-208 worker + 30-frame delay queue,
    MainController.cpp:223) run INSIDE the frame loop at reference scale
    (512 px / 81 classes).  Random-init weights (none ship in this image) —
    latency is weight-independent; score_threshold filters the noise
    detections so the SLAM side stays on the deterministic static scene."""
    import jax

    from maskfusion_tpu.camera import CameraIntrinsics, Resolution
    from maskfusion_tpu.config import Config
    from maskfusion_tpu.engine import MaskFusion
    from maskfusion_tpu.maskrcnn.inference import (
        FrameQueue, MaskRCNNInference, MaskRCNNWorker)
    from maskfusion_tpu.maskrcnn.model import MaskRCNNConfig

    W, H = 640, 480
    n_warm, n_timed = 6, 20
    frames = make_frames(W, H, n_warm + n_timed)
    for f in frames:
        f.mask = None   # force the NN lane
    cfg = Config(global_surfel_capacity=1 << 22,
                 seg_method="maskfusion", pipelined_multiobject=True)
    engine = MaskFusion(Resolution(W, H),
                        CameraIntrinsics(528.0, 528.0, 320.0, 240.0), cfg)
    inference = MaskRCNNInference(MaskRCNNConfig(score_threshold=0.999))
    # queue depth 5 (not the production 30): the bench streams only 26
    # frames, so a 30-slot queue would never overflow and the pump would
    # gate SLAM on NN completion of EVERY frame instead of exercising the
    # reference's lag semantics (frames exit unlabelled when the NN falls
    # more than the queue depth behind, MaskFusion.cpp:206-209)
    queue = FrameQueue(5)
    worker = MaskRCNNWorker(inference, queue)
    labelled = 0

    def consume(out):
        nonlocal labelled
        if out is not None:
            if out.mask is not None:
                labelled += 1
            engine.process_frame(out)

    def pump(frame):
        # NON-blocking: push, then process whatever the delay queue
        # releases (labelled head, or unlabelled head on overflow).  SLAM
        # must NOT gate on the NN — the reference's worker runs at its own
        # pace and frames exit unlabelled when it falls > queue-depth
        # behind (MaskFusion.cpp:206-209); a per-frame wait here measured
        # the NN lane's wall latency (3.1 FPS), not the async design.
        queue.push(frame)
        consume(queue.pop_ready())

    def drain_queue():
        # end of stream: flush remaining frames (unlabelled heads exit as
        # an overflowing queue would have released them)
        while len(queue):
            consume(queue.pop_ready(flush=True))

    try:
        for f in frames[:n_warm]:
            pump(f)
        drain_queue()
        engine.drain_pipeline()
        t0 = time.perf_counter()
        n_in = 0
        for f in frames[n_warm:]:
            pump(f)
            n_in += 1
        drain_queue()
        engine.drain_pipeline()
        jax.block_until_ready(engine.models[0].state.pose)
        total = time.perf_counter() - t0
    finally:
        worker.stop()
    fps = n_in / total
    print(json.dumps({
        "metric": "slam_fps_640x480_nn_in_loop",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
        "nn_labelled": labelled,
        "nn_px": inference.cfg.image_size,
        "nn_classes": inference.cfg.num_classes,
    }))


def main():
    from maskfusion_tpu.camera import CameraIntrinsics, Resolution
    from maskfusion_tpu.config import Config
    from maskfusion_tpu.engine import MaskFusion

    W, H = 640, 480
    cfg = Config(static_mode=True, global_surfel_capacity=1 << 22)
    engine = MaskFusion(Resolution(W, H),
                        CameraIntrinsics(528.0, 528.0, 320.0, 240.0), cfg)

    n_timed = 20
    n_warm = 8
    n_reps = 3          # median of 3 windows (bench-to-bench variance is
                        # ~±0.5 FPS; a single 20-frame window is too thin a
                        # basis for round-over-round deltas)
    frames = make_frames(W, H, n_timed * n_reps + n_warm)
    # warmup: init + compile + one full sync.  Eight frames cover both
    # checkerboard parities AND the periodic compacting variant of the
    # fused step (tick %% DIAG_INTERVAL == 0) before timing starts.
    for f in frames[:n_warm]:
        engine.process_frame(f)
    engine.flush_diagnostics()
    # compile the quarter-octave growth rungs the timed windows will cross
    # (327680, 409600 at VGA) BEFORE the clock starts — on a cold persistent
    # cache these are the same compiles the run would absorb mid-window, so
    # this moves them out of the measurement at ~zero net cold-start cost
    _prewarm_boxed(engine, rungs=2,
                   budget_s=max(60.0, _BUDGET_S * 0.5 - _elapsed()))

    # honest pipelined throughput: frames are enqueued without per-frame
    # host syncs; the clock stops only after the LAST frame's diagnostics
    # arrive, so queued work cannot masquerade as done.  Each frame's
    # host->device upload is staged one frame ahead (upload_frame) so the
    # transfer overlaps the previous frame's compute — the capture thread
    # does the same in the live readers.
    fps_reps = []
    base = n_warm
    for rep in range(n_reps):
        window = frames[base + rep * n_timed: base + (rep + 1) * n_timed]
        t0 = time.perf_counter()
        staged = engine.upload_frame(window[0])
        for nxt in window[1:]:
            nxt_staged = engine.upload_frame(nxt)
            engine.process_frame(staged)
            staged = nxt_staged
        engine.process_frame(staged)
        engine.flush_diagnostics()
        total = time.perf_counter() - t0
        fps_reps.append(n_timed / total)

    fps = sorted(fps_reps)[n_reps // 2]
    line = {
        "metric": "slam_fps_640x480_static",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
    }
    print(json.dumps(line), flush=True)
    return line


if __name__ == "__main__":
    headline = main()
    _HEADLINE = headline
    # second/third bench lines: the reference's headline MODE (multi-object
    # SLAM with per-frame segmentation) and the SLAM+NN-in-loop mode.  Both
    # are budget-gated and exception-proofed; the static headline is
    # ALWAYS re-printed last (try/finally) so a last-line parser sees it.
    try:
        if not os.environ.get("MFT_BENCH_SKIP_MULTI"):
            if not _over_budget("two-object bench"):
                try:
                    bench_two_objects()
                except Exception as e:
                    print(f"two-object bench failed: {e!r}", file=sys.stderr)
            if (not os.environ.get("MFT_BENCH_SKIP_NN")
                    and not _over_budget("nn-in-loop bench")):
                try:
                    bench_nn_in_loop()
                except Exception as e:
                    print(f"nn-in-loop bench failed: {e!r}", file=sys.stderr)
    finally:
        print(json.dumps(headline), flush=True)
