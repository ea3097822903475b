"""End-to-end static-mode SLAM on a synthetic trajectory (config 2+3 slice:
reader -> preprocess -> track -> fuse -> clean -> predict -> pose export)."""

import numpy as np
import jax.numpy as jnp

from maskfusion_tpu.camera import Resolution
from maskfusion_tpu.config import Config
from maskfusion_tpu.engine import MaskFusion
from maskfusion_tpu.frame import FrameData
from tests import synthetic as syn


def make_trajectory(n=6, step_t=0.004, step_r=0.003):
    poses = [np.eye(4, dtype=np.float32)]
    for i in range(1, n):
        rv = np.array([0.0, step_r * i, step_r * 0.3 * i])
        tv = np.array([step_t * i, 0.0, -step_t * 0.5 * i])
        poses.append(syn.pose_from(rv, tv))
    return poses


def run_slam(n_frames=6):
    cfg = Config(
        global_surfel_capacity=1 << 16,
        static_mode=True,
        use_so3=False,  # tiny rotations; so3 just adds runtime on CPU
    )
    engine = MaskFusion(Resolution(syn.W, syn.H), syn.DEFAULT_INTR, cfg)
    pts, cols = syn.make_scene()
    poses = make_trajectory(n_frames)
    diags = []
    for i, pose in enumerate(poses):
        rgb, depth = syn.render(pts, cols, pose, syn.DEFAULT_INTR)
        diags.append(engine.process_frame(FrameData(rgb=rgb, depth=depth,
                                                    timestamp=float(i))))
    return engine, poses, diags


def test_static_slam_trajectory():
    engine, poses, diags = run_slam()
    # ATE over the trajectory
    errs = []
    for logged, gt in zip(engine.global_model.pose_log, poses):
        errs.append(np.linalg.norm(logged["pose"][:3, 3] - gt[:3, 3]))
    ate_rmse = np.sqrt(np.mean(np.square(errs)))
    assert ate_rmse < 5e-3, f"ATE RMSE {ate_rmse*1000:.2f}mm"
    r_err = syn.rotation_angle_deg(
        engine.global_model.pose_log[-1]["pose"][:3, :3], poses[-1][:3, :3])
    assert r_err < 0.5, f"final rotation error {r_err} deg"
    # map stays healthy: bounded growth, tracking ok throughout
    assert all(d["tracking_ok"] for d in diags)
    n0 = diags[0]["surfels"]
    assert diags[-1]["surfels"] < 1.6 * n0
    # fused map agrees with ground-truth scene geometry
    m = engine.download_map()
    pts_scene, _ = syn.make_scene()
    # nearest scene z for a sample of surfels via grid interpolation
    sample = m["pos"][:: max(1, len(m["pos"]) // 500)]
    # scene is z = f(x, y); evaluate analytic surface
    X, Y = sample[:, 0], sample[:, 1]
    Z = 2.0 + 0.25 * np.sin(2.2 * X) + 0.18 * np.cos(3.1 * Y) + 0.05 * np.sin(7 * X * Y)
    in_range = (np.abs(X) < 1.5) & (np.abs(Y) < 1.2)
    zerr = np.abs(sample[:, 2] - Z)[in_range]
    assert np.median(zerr) < 0.01, f"map-to-scene median error {np.median(zerr)}"


def test_ground_truth_injection():
    # -p flag path: pose overridden each frame
    cfg = Config(global_surfel_capacity=1 << 16, use_so3=False,
                 static_mode=True)
    engine = MaskFusion(Resolution(syn.W, syn.H), syn.DEFAULT_INTR, cfg)
    pts, cols = syn.make_scene()
    poses = make_trajectory(3)
    for i, pose in enumerate(poses):
        rgb, depth = syn.render(pts, cols, pose, syn.DEFAULT_INTR)
        engine.process_frame(FrameData(rgb=rgb, depth=depth), gt_pose=pose)
        np.testing.assert_allclose(engine.current_pose, pose, atol=1e-6)


def test_prewarm_next_buckets_static():
    """prewarm_next_buckets AOT-lowers the fused static step at the next
    quarter-octave bucket rung(s) so a growing map never absorbs a graph
    compile mid-stream (the XLA analogue of the reference's fixed-capacity
    no-runtime-compile guarantee, Core/CMakeLists.txt:27).  Capacity must
    exceed the device-tuning bucket floor for a rung to exist."""
    cfg = Config(global_surfel_capacity=1 << 19, static_mode=True,
                 use_so3=False)
    eng = MaskFusion(Resolution(syn.W, syn.H), syn.DEFAULT_INTR, cfg)
    pts, cols = syn.make_scene()
    rgb, depth = syn.render(pts, cols, np.eye(4, dtype=np.float32),
                            syn.DEFAULT_INTR)
    eng.process_frame(FrameData(rgb=rgb, depth=depth))
    eng.process_frame(FrameData(rgb=rgb, depth=depth))  # frame 1 = init only
    assert "static_step" in eng._prewarm_ex
    # 1 rung x 2 checkerboard parities x {compact, kill-in-place} = 4
    assert eng.prewarm_next_buckets(_lower_only=True) == 4
    # at the bucket ceiling there is no next rung -> nothing to compile
    eng._prewarm_ex["static_step"][2]["bucket"] = 1 << 19
    assert eng.prewarm_next_buckets(_lower_only=True) == 0
