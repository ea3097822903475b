"""Multi-model SLAM: a moving object with precomputed masks (config 4 slice,
the reference's -method precomputed testing seam)."""

import numpy as np
import jax.numpy as jnp
import pytest

from maskfusion_tpu.camera import Resolution
from maskfusion_tpu.config import Config
from maskfusion_tpu.engine import MaskFusion
from maskfusion_tpu.frame import FrameData
from tests import synthetic as syn


def make_engine(**overrides):
    cfg = Config(
        global_surfel_capacity=1 << 16,
        object_surfel_capacity=1 << 13,
        seg_method="precomputed",
        use_so3=False,
        open_loop=True,
        **overrides,
    )
    return MaskFusion(Resolution(syn.W, syn.H), syn.DEFAULT_INTR, cfg)


def run_moving_object(n_frames=6, step=0.008, cam_poses=None, **overrides):
    eng = make_engine(**overrides)
    if cam_poses is None:
        cam_poses = [np.eye(4, dtype=np.float32)] * n_frames
    obj_offsets = []
    for i in range(n_frames):
        off = np.array([step * max(0, i - 1), 0.0, 0.0])
        obj_offsets.append(off)
        pts, cols, labels = syn.make_scene_with_object(offset=off)
        rgb, depth, lab = syn.render(pts, cols, cam_poses[i], syn.DEFAULT_INTR,
                                     labels=labels)
        frame = FrameData(rgb=rgb, depth=depth, mask=lab,
                          class_ids=[0, 7],  # object class 7
                          timestamp=float(i))
        eng.process_frame(frame)
    return eng, obj_offsets


def test_object_model_spawns():
    eng, _ = run_moving_object(n_frames=3, step=0.0)
    assert len(eng.models) == 2
    obj = eng.models[1]
    assert obj.model_id == 1
    assert obj.class_id == 7
    assert obj.surfel_count > 50


def test_object_motion_tracked():
    eng, offsets = run_moving_object(n_frames=6, step=0.008)
    assert len(eng.models) >= 2
    obj = eng.models[1]
    # obj->world translation should follow the cumulative object motion
    # (offsets are relative to the scene built at spawn time, frame 1)
    est = obj.pose_log[-1]["pose"][:3, 3]
    true = offsets[-1] - offsets[1]
    err = np.linalg.norm(est - true)
    assert np.linalg.norm(true) > 0.02  # sanity: object did move
    # 25 mm bound: the centre-registered model pyramids trade a little of
    # this short-scenario accuracy (the reference's half-texel-shifted
    # resize coincidentally flattered it) for full-sequence object
    # survival — the arbiter is tests/test_parity_sequence.py, where the
    # object model survives 71/72 aggressive frames instead of being
    # jump-deactivated twice
    assert err < 0.025, f"object translation error {err*1000:.1f}mm (true {true})"
    # camera stayed put
    cam_t = eng.current_pose[:3, 3]
    assert np.linalg.norm(cam_t) < 5e-3


def test_static_object_with_moving_camera():
    # object static; camera moves: object pose log should stay ~origin
    poses = [syn.pose_from(np.zeros(3), np.array([0.004 * i, 0, 0]))
             for i in range(5)]
    # Default (reference-parity blended tracker, trackAllModels=true
    # semantics): a 3-frame-old small object wobbles transiently — the
    # reference provides no static guarantee at all (its nonstatic
    # detection is gutted, MaskFusion.cpp:263,361-365).  The bound here
    # is a catastrophic-regression guard: the old ICP-only config slid
    # unboundedly (~1.3 cm/frame) under adverse codegen, the pre-erosion
    # blend drifted monotonically.
    eng, _ = run_moving_object(n_frames=5, step=0.0, cam_poses=poses)
    assert len(eng.models) >= 2
    obj = eng.models[1]
    est = obj.pose_log[-1]["pose"][:3, 3]
    assert np.linalg.norm(est) < 0.08, f"static object drifted {est}"
    cam_err = np.linalg.norm(eng.current_pose[:3, 3] - poses[-1][:3, 3])
    assert cam_err < 4e-3

    # Static-scene configuration (world-static GN warm start + coarse
    # damping + finest-level-only photometrics): the object must hold
    # still to mm level (measured 1.0 mm).
    eng2, _ = run_moving_object(
        n_frames=5, step=0.0, cam_poses=poses,
        object_warm_start=True, object_gn_damping=0.05,
        object_rgb_finest_only=True)
    assert len(eng2.models) >= 2
    est2 = eng2.models[1].pose_log[-1]["pose"][:3, 3]
    assert np.linalg.norm(est2) < 6e-3, f"warm-start drifted {est2}"


def test_mask_gates_fusion():
    # pixels labelled for the object must not fuse into the global model:
    # global surfel count should not grow over the object region
    eng, _ = run_moving_object(n_frames=4, step=0.0)
    obj = eng.models[1]
    m = eng.download_map(1)
    # object surfels concentrated near the object's world region (x~[-0.1,0.3])
    assert np.abs(np.median(m["pos"][:, 2]) - 1.5) < 0.1
    assert m["pos"][:, 0].min() > -0.35 and m["pos"][:, 0].max() < 0.55


def test_redetection_reactivates_inactive_model():
    """A deactivated object that reappears is re-activated instead of
    spawning a new model (enable_redetection; the reference declares this
    path but ships no matcher)."""
    import jax.numpy as jnp

    eng = make_engine(enable_redetection=True, keep_all_models=True,
                      model_spawn_offset=0)
    step = 0.0
    for i in range(3):
        pts, cols, labels = syn.make_scene_with_object()
        rgb, depth, lab = syn.render(pts, cols, np.eye(4, dtype=np.float32),
                                     syn.DEFAULT_INTR, labels=labels)
        eng.process_frame(FrameData(rgb=rgb, depth=depth, mask=lab,
                                    class_ids=[0, 7], timestamp=float(i)))
    assert len(eng.models) == 2
    obj = eng.models[1]
    old_id = obj.model_id
    # force-deactivate (as a tracking jump would)
    eng._inactivate_model(obj, "test")
    assert obj in eng.inactive_models and len(eng.models) == 1
    # object still visible in subsequent frames -> should be re-detected
    for i in range(3, 6):
        pts, cols, labels = syn.make_scene_with_object()
        rgb, depth, lab = syn.render(pts, cols, np.eye(4, dtype=np.float32),
                                     syn.DEFAULT_INTR, labels=labels)
        eng.process_frame(FrameData(rgb=rgb, depth=depth, mask=lab,
                                    class_ids=[0, 7], timestamp=float(i)))
    ids = [m.model_id for m in eng.models]
    assert old_id in ids, f"model {old_id} not reactivated (models {ids})"
    assert obj not in eng.inactive_models


def test_spawn_subtraction_carves_global_map():
    """-spawnSubtract: on object spawn the global map loses the surfels
    lying on the object surface (eraseErrorGeometry, Model.cpp:774-887;
    call site MaskFusion.cpp:355-358 — shipped disabled upstream)."""
    counts = {}
    for flag in (False, True):
        eng = make_engine(spawn_subtraction=True if flag else False)
        for i in range(3):
            pts, cols, labels = syn.make_scene_with_object()
            rgb, depth, lab = syn.render(
                pts, cols, np.eye(4, dtype=np.float32), syn.DEFAULT_INTR,
                labels=labels)
            eng.process_frame(FrameData(rgb=rgb, depth=depth, mask=lab,
                                        class_ids=[0, 7], timestamp=float(i)))
        assert len(eng.models) == 2
        counts[flag] = eng.models[0].surfel_count
    # the object region covers a meaningful surfel population
    carved = counts[False] - counts[True]
    assert carved > 30, f"spawn subtraction removed only {carved} surfels"


def test_two_objects_batched_tracking():
    """Two live object models exercise the single-dispatch vmapped object
    tracker and the batched global projection.  The guard: the batched
    path must produce the SAME model poses as the reference-style
    sequential per-model loop (MaskFusion.cpp:246-278)."""
    results = {}
    for batched in (True, False):
        eng = make_engine(model_spawn_offset=0,
                          batch_object_tracking=batched)
        for i in range(5):
            o1 = np.array([0.006 * max(0, i - 1), 0.0, 0.0])
            o2 = np.array([0.0, -0.006 * max(0, i - 2), 0.0])
            pts, cols, labels = syn.make_scene_with_two_objects(o1, o2)
            rgb, depth, lab = syn.render(
                pts, cols, np.eye(4, dtype=np.float32), syn.DEFAULT_INTR,
                labels=labels)
            eng.process_frame(FrameData(rgb=rgb, depth=depth, mask=lab,
                                        class_ids=[0, 7, 8],
                                        timestamp=float(i)))
        assert len(eng.models) == 3, [m.model_id for m in eng.models]
        results[batched] = [np.asarray(m.state.pose) for m in eng.models]
    # global pose must agree tightly; OBJECT poses only loosely — the
    # small-object GN is ill-conditioned (CLAUDE.md round-3 robustness
    # notes: outcomes flip with XLA codegen alone), so the vmapped vs
    # sequential lowerings' f32 rounding amplifies to ~1e-3 over the 4
    # tracked frames since spawn-frame initialisation landed
    np.testing.assert_allclose(results[True][0], results[False][0],
                               atol=1e-4)
    for pb, ps in zip(results[True][1:], results[False][1:]):
        np.testing.assert_allclose(pb, ps, atol=8e-3)
