import os

import numpy as np
import pytest

from maskfusion_tpu.frame import FrameData
from maskfusion_tpu.io import export as ex
from maskfusion_tpu.io.ground_truth import GroundTruthOdometry
from maskfusion_tpu.io.image_reader import ImageLogReader
from maskfusion_tpu.io.klg_reader import KlgLogReader, write_klg
from tests import synthetic as syn


def write_dataset(tmpdir, n=3, with_masks=True, depth_fmt="exr"):
    import cv2

    pts, cols, labels = syn.make_scene_with_object()
    for i in range(n):
        rgb, depth, lab = syn.render(pts, cols, np.eye(4), syn.DEFAULT_INTR,
                                     labels=labels)
        cv2.imwrite(os.path.join(tmpdir, f"Color{i:04d}.png"),
                    cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        if depth_fmt == "exr":
            from maskfusion_tpu.io.exr import write_exr

            write_exr(os.path.join(tmpdir, f"Depth{i:04d}.exr"), {"Y": depth})
        else:
            cv2.imwrite(os.path.join(tmpdir, f"Depth{i:04d}.png"),
                        (depth * 1000).astype(np.uint16))
        if with_masks:
            cv2.imwrite(os.path.join(tmpdir, f"Mask{i:04d}.png"), lab)
            with open(os.path.join(tmpdir, f"Mask{i:04d}.png.txt"), "w") as f:
                f.write("7\n10 10 40 40\n")
    return tmpdir


def test_image_reader_exr(tmp_path):
    d = write_dataset(str(tmp_path))
    r = ImageLogReader(str(tmp_path), prefetch=False)
    assert r.get_num_frames() == 3
    assert r.has_masks()
    f = r.get_next()
    assert f.rgb.shape == (syn.H, syn.W, 3)
    assert f.depth.dtype == np.float32
    assert 1.0 < np.median(f.depth[f.depth > 0]) < 3.0
    assert f.mask is not None and (f.mask == 1).sum() > 100
    assert f.class_ids == [0, 7]
    assert f.rois == [(10, 10, 40, 40)]
    n = 1
    while r.has_more():
        r.get_next()
        n += 1
    assert n == 3


def test_image_reader_prefetch(tmp_path):
    write_dataset(str(tmp_path))
    r = ImageLogReader(str(tmp_path), prefetch=True)
    frames = list(r)
    assert len(frames) == 3
    assert frames[0].index == 0 and frames[2].index == 2
    r.close()


def test_image_reader_png_depth(tmp_path):
    write_dataset(str(tmp_path), depth_fmt="png", with_masks=False)
    r = ImageLogReader(str(tmp_path), prefetch=False)
    f = r.get_next()
    assert f.depth.dtype == np.uint16          # raw mm wire format
    d = f.host_depth()
    assert abs(np.median(d[d > 0]) - 2.0) < 0.5  # mm -> m scale


def test_klg_roundtrip(tmp_path):
    pts, cols = syn.make_scene()
    frames = []
    for i in range(3):
        rgb, depth = syn.render(pts, cols, np.eye(4), syn.DEFAULT_INTR)
        frames.append(FrameData(rgb=rgb, depth=depth, timestamp=float(i * 100)))
    path = str(tmp_path / "test.klg")
    write_klg(path, frames)
    r = KlgLogReader(path, syn.W, syn.H)
    assert r.get_num_frames() == 3
    f0 = r.get_next()
    assert f0.timestamp == 0.0
    assert f0.depth.dtype == np.uint16
    np.testing.assert_allclose(f0.host_depth(), frames[0].depth,
                               atol=2e-3)  # mm quant
    assert np.abs(f0.rgb.astype(int) - frames[0].rgb.astype(int)).mean() < 12  # jpeg
    f1 = r.get_next()
    fb = r.get_previous()
    assert fb.timestamp == f1.timestamp
    assert r.rewind()
    assert r.get_next().timestamp == 0.0


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 100
    surfels = {
        "pos": rng.normal(size=(n, 3)).astype(np.float32),
        "conf": np.linspace(0, 20, n).astype(np.float32),
        "color": rng.uniform(0, 255, (n, 3)).astype(np.float32),
        "normal": rng.normal(size=(n, 3)).astype(np.float32),
        "radius": rng.uniform(0.001, 0.01, n).astype(np.float32),
    }
    path = str(tmp_path / "map.ply")
    k = ex.save_ply(path, surfels, conf_threshold=10.0)
    assert k == (surfels["conf"] > 10.0).sum()
    back = ex.load_ply(path)
    keep = surfels["conf"] > 10.0
    np.testing.assert_allclose(back["pos"], surfels["pos"][keep], atol=1e-6)


def test_pose_export_tum_format(tmp_path):
    class FakeModel:
        model_id = 0
        pose_log = [
            {"timestamp": 1.5, "tick": 1, "pose": np.eye(4)},
            {"timestamp": 2.5, "tick": 2,
             "pose": syn.pose_from(np.array([0, 0, 0.1]), np.array([1, 2, 3]))},
        ]

    paths = ex.export_poses(str(tmp_path), [FakeModel()])
    lines = open(paths[0]).read().splitlines()
    assert len(lines) == 2
    vals = [float(v) for v in lines[1].split()]
    assert len(vals) == 8
    assert vals[0] == 2.5 and vals[1:4] == [1.0, 2.0, 3.0]
    q = np.array(vals[4:])
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-6)


def test_ground_truth_odometry(tmp_path):
    path = str(tmp_path / "traj.txt")
    with open(path, "w") as f:
        f.write("# comment\n")
        f.write("0.0 0 0 0 0 0 0 1\n")
        f.write("1.0 1 0 0 0 0 0 1\n")
        f.write("2.0 2 0 0 0 0 0.7071068 0.7071068\n")
    gt = GroundTruthOdometry(path)
    p0 = gt.get_pose(0.0)
    np.testing.assert_allclose(p0, np.eye(4), atol=1e-6)
    p1 = gt.get_pose(1.1)  # nearest
    np.testing.assert_allclose(p1[:3, 3], [1, 0, 0], atol=1e-6)
    p2 = gt.get_pose(2.0)
    assert abs(p2[0, 0]) < 1e-5  # 90 deg z-rotation


def test_segmentation_exports(tmp_path):
    seg = np.zeros((syn.H, syn.W), np.uint8)
    seg[10:20, 10:20] = 1
    seg[30:40, 30:40] = 255
    p1 = ex.export_segmentation_png(str(tmp_path), 5, seg)
    p2 = ex.export_label_image(str(tmp_path), 5, seg)
    import cv2

    back = cv2.imread(p1, cv2.IMREAD_GRAYSCALE)
    assert back[15, 15] == 1 and back[35, 35] == 0  # 255 zeroed
    assert os.path.exists(p2)


def test_exr_codec_roundtrip(tmp_path):
    from maskfusion_tpu.io.exr import read_exr, write_exr

    rng = np.random.default_rng(0)
    img = rng.uniform(0.3, 4.0, (120, 160)).astype(np.float32)
    for comp, half in [(0, False), (3, False), (2, False), (3, True)]:
        p = str(tmp_path / f"t{comp}{half}.exr")
        write_exr(p, {"Y": img}, compression=comp, half=half)
        back = read_exr(p)["Y"]
        atol = 2e-3 if half else 1e-7
        np.testing.assert_allclose(back, img, atol=atol, rtol=1e-3 if half else 0)


def test_exr_multichannel(tmp_path):
    from maskfusion_tpu.io.exr import read_exr, write_exr, read_exr_depth

    rng = np.random.default_rng(1)
    chans = {c: rng.uniform(0, 2, (33, 40)).astype(np.float32)
             for c in ("R", "G", "B")}
    p = str(tmp_path / "rgb.exr")
    write_exr(p, chans)
    back = read_exr(p)
    for c in chans:
        np.testing.assert_allclose(back[c], chans[c], atol=1e-7)
    # reference depth convention: first channel of RGB float images
    np.testing.assert_allclose(read_exr_depth(p), chans["R"], atol=1e-7)


def test_checkpoint_resume(tmp_path):
    """Save mid-run, restore into a fresh engine, continue — trajectories
    must match a run without the interruption."""
    import jax.numpy as jnp
    from maskfusion_tpu.camera import Resolution
    from maskfusion_tpu.config import Config
    from maskfusion_tpu.engine import MaskFusion
    from maskfusion_tpu.io import checkpoint

    cfg = Config(global_surfel_capacity=1 << 16, static_mode=True,
                 use_so3=False, relocalisation=True, close_loops=True)

    def make():
        return MaskFusion(Resolution(syn.W, syn.H), syn.DEFAULT_INTR, cfg)

    pts, cols = syn.make_scene()
    def frame(i):
        pose = syn.pose_from(np.zeros(3), np.array([0.004 * i, 0, 0]))
        rgb, depth = syn.render(pts, cols, pose, syn.DEFAULT_INTR)
        return FrameData(rgb=rgb, depth=depth, timestamp=float(i))

    a = make()
    for i in range(3):
        a.process_frame(frame(i))
    checkpoint.save(a, str(tmp_path / "ckpt"))

    b = make()
    checkpoint.load(b, str(tmp_path / "ckpt"))
    assert b.tick == a.tick
    assert b.global_model.surfel_count == a.global_model.surfel_count
    assert len(b.ferns.frames) == len(a.ferns.frames)
    np.testing.assert_allclose(b.current_pose, a.current_pose, atol=1e-6)

    # both continue identically
    for i in range(3, 5):
        da = a.process_frame(frame(i))
        db = b.process_frame(frame(i))
    np.testing.assert_allclose(a.current_pose, b.current_pose, atol=1e-5)
    assert a.global_model.surfel_count == b.global_model.surfel_count
