"""CLI end-to-end: the -dir/-static/-method/-cal/export surface
(MainController equivalent)."""

import os

import numpy as np

from maskfusion_tpu.main import main
from tests import synthetic as syn
from tests.test_io import write_dataset


def _write_cal(tmp_path):
    cal = tmp_path / "cal.txt"
    intr = syn.DEFAULT_INTR
    cal.write_text(f"{intr.fx} {intr.fy} {intr.cx} {intr.cy}\n")
    return str(cal)


def test_cli_static_run_with_exports(tmp_path):
    data = tmp_path / "data"
    data.mkdir()
    write_dataset(str(data), n=3, with_masks=False)
    out = tmp_path / "out"
    rc = main([
        "-dir", str(data), "-static", "-q", "-nso",
        "-cal", _write_cal(tmp_path),
        "-exportdir", str(out), "-ep", "-em",
        "--global-capacity", str(1 << 16),
    ])
    assert rc == 0
    assert (out / "poses-0.txt").exists()
    lines = (out / "poses-0.txt").read_text().splitlines()
    assert len(lines) == 3
    assert all(len(l.split()) == 8 for l in lines)
    assert (out / "cloud-0.ply").exists()
    from maskfusion_tpu.io.export import load_ply

    cloud = load_ply(str(out / "cloud-0.ply"))
    assert len(cloud["pos"]) == 0 or np.isfinite(cloud["pos"]).all()


def test_cli_precomputed_multimodel(tmp_path):
    data = tmp_path / "data"
    data.mkdir()
    write_dataset(str(data), n=3, with_masks=True)
    out = tmp_path / "out"
    rc = main([
        "-dir", str(data), "-method", "precomputed", "-q", "-nso",
        "-cal", _write_cal(tmp_path),
        "-exportdir", str(out), "-ep", "-es", "-el",
        "--global-capacity", str(1 << 16),
        "--object-capacity", str(1 << 13),
    ])
    assert rc == 0
    # object model spawned -> second pose log exists
    assert (out / "poses-1.txt").exists()
    assert (out / "Segmentation3.png").exists()
    assert (out / "Labels3.png").exists()


def test_viewer_and_viewport_export(tmp_path):
    import numpy as np
    from maskfusion_tpu.camera import Resolution
    from maskfusion_tpu.config import Config
    from maskfusion_tpu.engine import MaskFusion
    from maskfusion_tpu.frame import FrameData
    from maskfusion_tpu import viewer

    cfg = Config(global_surfel_capacity=1 << 16, static_mode=True,
                 use_so3=False)
    eng = MaskFusion(Resolution(syn.W, syn.H), syn.DEFAULT_INTR, cfg)
    pts, cols = syn.make_scene()
    rgb, depth = syn.render(pts, cols, np.eye(4), syn.DEFAULT_INTR)
    eng.process_frame(FrameData(rgb=rgb, depth=depth))
    eng.process_frame(FrameData(rgb=rgb, depth=depth))

    # novel-view render of the map
    pose = syn.pose_from(np.array([0, 0.05, 0]), np.array([0.05, 0, -0.1]))
    view = viewer.render_map_view(eng.models[0].state.map, pose,
                                  syn.DEFAULT_INTR, syn.W, syn.H)
    assert view["rgb"].shape == (syn.H, syn.W, 3)
    assert (view["depth"] > 0).mean() > 0.5  # most of the map visible
    p = viewer.save_viewport(eng, str(tmp_path / "vp.png"))
    import os
    assert os.path.getsize(p) > 1000


def test_cli_live_viewer_offscreen(tmp_path, monkeypatch):
    """-viewer on a headless box: the LiveViewer must compose its canvas
    every frame through the offscreen path (same panels as the window mode,
    GUI.h:172-248) without ever touching a display."""
    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)
    captured = {}

    from maskfusion_tpu import gui

    orig_update = gui.LiveViewer.update

    def spy_update(self, diag=None):
        ok = orig_update(self, diag)
        assert self.offscreen        # auto-detected: no display configured
        captured["canvas"] = self.last_canvas
        captured["shot"] = self.screenshot(str(tmp_path / "shot.png"))
        return ok

    monkeypatch.setattr(gui.LiveViewer, "update", spy_update)

    data = tmp_path / "data"
    data.mkdir()
    write_dataset(str(data), n=3, with_masks=False)
    rc = main([
        "-dir", str(data), "-static", "-q", "-nso", "-viewer",
        "-cal", _write_cal(tmp_path),
        "--global-capacity", str(1 << 16),
    ])
    assert rc == 0
    canvas = captured["canvas"]
    # 2x2 panel grid + 24 px HUD bar
    assert canvas.shape == (2 * syn.H + 24, 2 * syn.W, 3)
    assert canvas.dtype == np.uint8
    # panels carry real content (predicted rgb + map render + depth)
    assert canvas[24:, :].std() > 5.0
    assert os.path.getsize(captured["shot"]) > 1000


def test_fxaa_smooths_edges_preserves_flats():
    """FXAA parity (Core/Shaders/fxaa.frag): a hard diagonal edge gains
    intermediate intensities (anti-aliased), while flat regions pass
    through bit-exact (luma range below the reduce threshold)."""
    from maskfusion_tpu.viewer import fxaa

    H = W = 64
    yy, xx = np.mgrid[:H, :W]
    img = np.repeat(
        np.where((xx + yy * 2 > 80)[..., None], 230, 20), 3,
        axis=-1).astype(np.uint8)
    out = fxaa(img)
    assert out.shape == img.shape and out.dtype == np.uint8
    # anti-aliasing creates intermediate levels along the staircase edge
    mid = ((out > 60) & (out < 190)).sum()
    mid_in = ((img > 60) & (img < 190)).sum()
    assert mid > mid_in + 30
    # flat interior untouched
    assert (out[:8, :8] == 20).all()
    assert (out[-8:, -8:] == 230).all()
    # flat image is a no-op
    flat = np.full((32, 32, 3), 128, np.uint8)
    assert (fxaa(flat) == flat).all()


def test_orbit_camera_geometry():
    from maskfusion_tpu.viewer import OrbitCamera

    cam = OrbitCamera(pivot=(0.2, -0.1, 1.5), distance=2.0,
                      yaw=0.4, pitch=-0.2)
    pose = cam.pose()
    R = pose[:3, :3]
    # orthonormal, right-handed
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-6)
    assert np.linalg.det(R) > 0.99
    # camera sits `distance` from the pivot and looks straight at it:
    # the pivot in camera coords is (0, 0, distance)
    pivot_cam = np.linalg.inv(pose) @ np.array([0.2, -0.1, 1.5, 1.0])
    np.testing.assert_allclose(pivot_cam[:3], [0, 0, 2.0], atol=1e-6)
    # dolly moves along the view ray, pivot stays centred
    cam.dolly(0.5)
    pivot_cam = np.linalg.inv(cam.pose()) @ np.array([0.2, -0.1, 1.5, 1.0])
    np.testing.assert_allclose(pivot_cam[:3], [0, 0, 1.0], atol=1e-6)
    # orbit keeps the pivot centred too
    cam.rotate(0.7, 0.3)
    pivot_cam = np.linalg.inv(cam.pose()) @ np.array([0.2, -0.1, 1.5, 1.0])
    np.testing.assert_allclose(pivot_cam[:3], [0, 0, 1.0], atol=1e-6)
    # from_pose seeds the orbit on the live camera: same eye, pivot ahead
    live = np.eye(4, dtype=np.float32)
    live[:3, 3] = (0.3, 0.1, -0.2)
    seeded = OrbitCamera.from_pose(live, lookahead=2.0)
    np.testing.assert_allclose(seeded.pose(), live, atol=1e-6)


def test_live_viewer_orbit_and_fxaa_keys(tmp_path, monkeypatch):
    """'m' detaches the map panel onto the orbit camera (free 3D
    inspection), 'x' toggles FXAA (GUI.h:238), 'r' re-seeds on the live
    camera — all through the offscreen compose path."""
    from maskfusion_tpu.camera import Resolution
    from maskfusion_tpu.config import Config
    from maskfusion_tpu.engine import MaskFusion
    from maskfusion_tpu.frame import FrameData
    from maskfusion_tpu.gui import LiveViewer

    cfg = Config(global_surfel_capacity=1 << 16, static_mode=True,
                 use_so3=False)
    eng = MaskFusion(Resolution(syn.W, syn.H), syn.DEFAULT_INTR, cfg)
    pts, cols = syn.make_scene()
    rgb, depth = syn.render(pts, cols, np.eye(4), syn.DEFAULT_INTR)
    eng.process_frame(FrameData(rgb=rgb, depth=depth))
    eng.process_frame(FrameData(rgb=rgb, depth=depth))

    v = LiveViewer(eng, offscreen=True)
    assert v.update()
    follow = v.last_canvas.copy()

    assert v._handle_key(ord("m"))        # enter orbit mode
    assert v.free_orbit and v.orbit is not None
    # seeded on the live camera -> identical view before any mouse input
    v.orbit.rotate(0.6, 0.25)
    v.orbit.dolly(1.6)
    assert v.update()
    orbited = v.last_canvas
    # moving the inspection camera changes the map panel (top-right),
    # not the predicted-RGB panel (top-left)
    Hh = syn.H
    assert (orbited[24:24 + Hh, syn.W:] != follow[24:24 + Hh, syn.W:]).mean() > 0.05
    np.testing.assert_array_equal(orbited[24:24 + Hh, :syn.W],
                                  follow[24:24 + Hh, :syn.W])

    assert v._handle_key(ord("x"))        # FXAA on
    assert v.fxaa
    assert v.update()
    assert v.last_canvas.shape == follow.shape

    assert v._handle_key(ord("x"))        # FXAA back off
    assert v._handle_key(ord("r"))        # re-seed orbit on live camera
    assert v._handle_key(ord("m"))        # back to follow mode
    assert not v.free_orbit
    assert v.update()
    np.testing.assert_array_equal(v.last_canvas[24:, syn.W:],
                                  follow[24:, syn.W:])


def test_live_viewer_model_strip(tmp_path):
    """With object models live, the viewer appends a per-model viewport row
    (the reference fills up to four P1..P4 panels with per-model textures
    and blanks the rest, GUI/MainController.cpp:909-921)."""
    from maskfusion_tpu.camera import Resolution
    from maskfusion_tpu.config import Config
    from maskfusion_tpu.engine import MaskFusion
    from maskfusion_tpu.frame import FrameData
    from maskfusion_tpu.gui import LiveViewer

    cfg = Config(global_surfel_capacity=1 << 16, static_mode=True,
                 use_so3=False)
    eng = MaskFusion(Resolution(syn.W, syn.H), syn.DEFAULT_INTR, cfg)
    pts, cols = syn.make_scene()
    rgb, depth = syn.render(pts, cols, np.eye(4), syn.DEFAULT_INTR)
    eng.process_frame(FrameData(rgb=rgb, depth=depth))

    v = LiveViewer(eng, offscreen=True)
    assert v.update()
    base_h = v.last_canvas.shape[0]

    # global-only -> no strip
    assert v._model_strip(syn.W, syn.H) is None

    # a second live model switches the strip on (state shape is all the
    # strip reads, so the global model doubles as a stand-in object model)
    eng.models.append(eng.models[0])
    try:
        strip = v._model_strip(syn.W, syn.H)
        assert strip is not None
        assert strip.shape == (syn.H // 2, 2 * syn.W, 3)
        # 2 live thumbs + 2 displayEmpty blanks
        blank = strip[:, syn.W:]
        assert (blank == 0).all()
        assert (strip[:, :syn.W] != 0).any()
        assert v.update()
        assert v.last_canvas.shape[0] == base_h + syn.H // 2
    finally:
        eng.models.pop()
