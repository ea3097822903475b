import os

import numpy as np
import pytest

from tests import synthetic as syn


def test_ate_rmse_identity_and_offset(tmp_path):
    from maskfusion_tpu.tools.evaluate import ate_rmse

    rng = np.random.default_rng(0)
    gt_lines, est_lines, est_off = [], [], []
    for i in range(20):
        t = np.array([0.1 * i, 0.02 * i, 0.0])
        gt_lines.append(f"{i * 0.1} {t[0]} {t[1]} {t[2]} 0 0 0 1")
        n = rng.normal(0, 0.005, 3)
        est_lines.append(
            f"{i * 0.1} {t[0]+n[0]} {t[1]+n[1]} {t[2]+n[2]} 0 0 0 1")
        # rigidly offset trajectory: ATE after alignment should be ~noise-free
        est_off.append(
            f"{i * 0.1} {t[0]+1.0} {t[2]+2.0} {-t[1]+0.5} 0 0 0 1")
    gt = tmp_path / "gt.txt"
    gt.write_text("\n".join(gt_lines))
    est = tmp_path / "est.txt"
    est.write_text("\n".join(est_lines))
    off = tmp_path / "off.txt"
    off.write_text("\n".join(est_off))

    r = ate_rmse(str(est), str(gt))
    assert r["pairs"] == 20
    assert r["rmse"] < 0.01
    r2 = ate_rmse(str(off), str(gt))   # pure rigid transform -> ~0 after align
    assert r2["rmse"] < 1e-6


def test_segmentation_iou(tmp_path):
    import cv2

    from maskfusion_tpu.tools.evaluate import segmentation_iou

    est_d = tmp_path / "est"
    gt_d = tmp_path / "gt"
    est_d.mkdir()
    gt_d.mkdir()
    gt = np.zeros((60, 80), np.uint8)
    gt[10:30, 10:30] = 1
    est = np.zeros((60, 80), np.uint8)
    est[12:30, 10:32] = 5  # different instance numbering, overlapping
    cv2.imwrite(str(gt_d / "Segmentation1.png"), gt)
    cv2.imwrite(str(est_d / "Segmentation1.png"), est)
    r = segmentation_iou(str(est_d), str(gt_d))
    assert r["frames"] == 1 and r["instances"] == 1
    assert 0.6 < r["mean_iou"] < 1.0


def test_bbox_label_tool(tmp_path):
    import cv2

    from maskfusion_tpu.tools.sequence_add_bbox_labels import main
    from tests.test_io import write_dataset

    d = tmp_path / "data"
    d.mkdir()
    write_dataset(str(d), n=2)
    out = tmp_path / "out"
    rc = main(["-dir", str(d), "-o", str(out)])
    assert rc == 0
    assert len(list(out.glob("Color*.png"))) == 2


def test_video_reader(tmp_path):
    import cv2

    from maskfusion_tpu.io.live_readers import DeviceNotAvailable, VideoLogReader

    # write a tiny video
    path = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 48))
    for i in range(5):
        w.write(np.full((48, 64, 3), i * 40, np.uint8))
    w.release()
    r = VideoLogReader(path, synthetic_depth=1.0)
    f = r.get_next()
    assert f.rgb.shape == (48, 64, 3)
    assert np.all(f.depth == 1.0)
    n = 1
    while (f := r.get_next()) is not None:
        n += 1
    assert n == 5
    with pytest.raises(DeviceNotAvailable):
        VideoLogReader(str(tmp_path / "missing.avi"))


def test_live_reader_stubs_raise_cleanly():
    from maskfusion_tpu.io.live_readers import (
        DeviceNotAvailable, FreenectLiveReader, OpenNI2LiveReader,
        RealsenseLiveReader,
    )

    for cls in (OpenNI2LiveReader, FreenectLiveReader, RealsenseLiveReader):
        with pytest.raises(DeviceNotAvailable):
            cls()


def test_fern_model_matcher():
    from maskfusion_tpu.mapping.model_matching import FernModelMatcher

    class FakeState:
        pass

    class FakeModel:
        def __init__(self, mid, img):
            self.model_id = mid
            self.state = FakeState()
            self.state.pred_rgb = img

    rng = np.random.default_rng(0)
    img_a = rng.uniform(0, 255, (40, 40, 3)).astype(np.float32)
    img_b = rng.uniform(0, 255, (40, 40, 3)).astype(np.float32)
    import jax.numpy as jnp

    class FakeFullState:
        pose = np.eye(4)

    ma = FakeModel(1, img_a)
    ma.state.pose = np.eye(4)
    mb = FakeModel(2, img_b)
    mb.state.pose = np.eye(4)
    matcher = FernModelMatcher()
    assert matcher.build_model_description(ma)
    assert matcher.build_model_description(mb)

    from maskfusion_tpu.frame import FrameData

    frame = FrameData(rgb=img_a.astype(np.uint8),
                      depth=np.ones((40, 40), np.float32))
    res = matcher.detect_in_region(frame, (0, 0, 40, 40), [ma, mb])
    assert res is not None and res.model_id == 1


def test_tuning_registry():
    from maskfusion_tpu.utils.tuning import get_tuning

    t = get_tuning()
    assert t.min_bucket_global > 0 and t.diag_interval >= 1
    # the registry is wired, not decorative: the engine consumes it
    from maskfusion_tpu.camera import CameraIntrinsics, Resolution
    from maskfusion_tpu.config import Config
    from maskfusion_tpu.engine import MaskFusion

    eng = MaskFusion(Resolution(64, 48),
                     CameraIntrinsics(52.0, 52.0, 32.0, 24.0),
                     Config(static_mode=True,
                            global_surfel_capacity=1 << 12))
    assert eng._tuning == t
    assert eng.DIAG_INTERVAL == t.diag_interval


def test_diag_export_artifacts(tmp_path):
    """-diagdir writes the metrics CSV + per-model alignment-error images
    (offline equivalent of MainController.cpp:500-515's live diagnostics)."""
    import numpy as np

    from maskfusion_tpu.camera import Resolution
    from maskfusion_tpu.config import Config
    from maskfusion_tpu.engine import MaskFusion
    from maskfusion_tpu.frame import FrameData
    from tests import synthetic as syn

    out = tmp_path / "diag"
    cfg = Config(global_surfel_capacity=1 << 16, static_mode=True,
                 use_so3=False, diag_export_dir=str(out),
                 diag_export_interval=1)
    eng = MaskFusion(Resolution(syn.W, syn.H), syn.DEFAULT_INTR, cfg)
    pts, cols = syn.make_scene()
    rgb, depth = syn.render(pts, cols, np.eye(4), syn.DEFAULT_INTR)
    for i in range(3):
        eng.process_frame(FrameData(rgb=rgb, depth=depth, timestamp=float(i)))
    csv_path = out / "metrics.csv"
    assert csv_path.exists()
    rows = csv_path.read_text().strip().splitlines()
    assert len(rows) >= 3           # header + >=2 frame rows
    assert "ms_Run" in rows[0] and "tracking_ok" in rows[0]


def test_bench_prewarm_boxed(monkeypatch):
    """bench._prewarm_boxed: returns the engine's prewarm count on success,
    None when the prewarm thread misses its join deadline (the wedged-
    remote-compile case it exists for), and skips under MFT_BENCH_PREWARM=0."""
    import sys as _sys
    _sys.path.insert(0, "/root/repo")
    import bench

    class FakeEngine:
        def prewarm_next_buckets(self, rungs, budget_s):
            return 7

    assert bench._prewarm_boxed(FakeEngine(), rungs=1, budget_s=5.0) == 7

    class HangingEngine:
        def prewarm_next_buckets(self, rungs, budget_s):
            import time as _t
            _t.sleep(3600)

    assert bench._prewarm_boxed(HangingEngine(), rungs=1, budget_s=0.1) is None

    monkeypatch.setenv("MFT_BENCH_PREWARM", "0")
    assert bench._prewarm_boxed(FakeEngine(), rungs=1, budget_s=5.0) is None
