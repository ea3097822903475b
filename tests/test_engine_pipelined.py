"""Pipelined multi-object scheduling must match the synchronous path.

The pipelined engine (engine._pipelined_step) runs frame t-1's host stage
(segmentation, lifecycle, fuse dispatch) while frame t's device work runs,
with all device->host reads prefetched.  The REFERENCE dataflow
(MaskFusion.cpp:200-607) is preserved exactly — track(t) sees the map fused
through t-1 in both schedules — so after draining the pipeline the two
paths must produce the same models and poses."""

import numpy as np

from maskfusion_tpu.camera import Resolution
from maskfusion_tpu.config import Config
from maskfusion_tpu.engine import MaskFusion
from maskfusion_tpu.frame import FrameData
from tests import synthetic as syn


def run(pipelined: bool, n_frames: int = 6, object_window: int = 0,
        mask_lag: bool = False, min_object_slots: int = 0):
    cfg = Config(
        global_surfel_capacity=1 << 16,
        object_surfel_capacity=1 << 13,
        seg_method="maskfusion",
        use_so3=False,
        model_spawn_offset=0,
        pipelined_multiobject=pipelined,
        object_window=object_window,
        object_window_margin=24,
        # exact sequential dataflow for the equality tests; the lag variant
        # is exercised by test_mask_lag_tracks_object
        fuse_mask_lag=mask_lag,
        min_object_slots=min_object_slots,
    )
    eng = MaskFusion(Resolution(syn.W, syn.H), syn.DEFAULT_INTR, cfg)
    for i in range(n_frames):
        off = np.array([0.006 * max(0, i - 1), 0.0, 0.0])
        pts, cols, labels = syn.make_scene_with_object(offset=off)
        rgb, depth, lab = syn.render(pts, cols, np.eye(4, dtype=np.float32),
                                     syn.DEFAULT_INTR, labels=labels)
        eng.process_frame(FrameData(rgb=rgb, depth=depth, mask=lab,
                                    class_ids=[0, 7], timestamp=float(i)))
    eng.drain_pipeline()
    return eng


def test_pipelined_matches_sync():
    e_sync = run(False)
    e_pipe = run(True)
    assert [m.model_id for m in e_pipe.models] == \
           [m.model_id for m in e_sync.models]
    for mp, ms in zip(e_pipe.models, e_sync.models):
        # 5e-5: the two schedules group the same ops into different jit
        # programs, and XLA:CPU fusion differences produce f32 jitter
        np.testing.assert_allclose(np.asarray(mp.state.pose),
                                   np.asarray(ms.state.pose), atol=5e-5)
        assert abs(mp.surfel_count - ms.surfel_count) <= 2, (
            mp.model_id, mp.surfel_count, ms.surfel_count)


def test_pipelined_spawns_and_tracks_object():
    eng = run(True)
    assert len(eng.models) >= 2
    obj = eng.models[1]
    est = obj.pose_log[-1]["pose"][:3, 3]
    assert np.asarray(est)[0] > 0.005   # object moved along +x


def test_mask_lag_tracks_object():
    """fuse_mask_lag fuses frame t with seg(t-1) (device never idles during
    host segmentation).  One frame of mask lag must not break spawning or
    object tracking."""
    eng = run(True, n_frames=8, mask_lag=True)
    assert len(eng.models) >= 2
    obj = eng.models[1]
    assert obj.fused_once                      # lagged first fuse landed
    assert obj.surfel_count > 50               # object map populated
    est = obj.pose_log[-1]["pose"][:3, 3]
    assert np.asarray(est)[0] > 0.005          # object motion recovered
    # global map unharmed by the lagged masks
    glob = eng.models[0]
    assert glob.surfel_count > 1000


def test_slot_class():
    from maskfusion_tpu.engine import _slot_class

    assert [_slot_class(n, 0) for n in range(6)] == [0, 1, 2, 4, 4, 8]
    assert [_slot_class(n, 2) for n in range(4)] == [2, 2, 2, 4]


def test_padded_object_slots_match_exact():
    """Object-axis size-class padding (min_object_slots pins the class; dead
    slots carry DEAD_SLOT_ID + an empty map): the padded graphs must spawn
    the same models and track the same trajectories as the exact-width run.
    Matching is numeric, not bit-exact: a different object-axis vmap width
    changes XLA:CPU's f32 reduction codegen, and the GN solves amplify that
    through the map feedback (round-3 finding; measured global-pose delta
    ~7e-5 at 8 frames).  This is the lever that keeps model spawns/deletes
    within a size class from recompiling the two fused multi-object graphs
    (90-230 s each on the remote transport)."""
    e_exact = run(True, n_frames=8, object_window=104, mask_lag=True)
    e_pad = run(True, n_frames=8, object_window=104, mask_lag=True,
                min_object_slots=2)
    assert [m.model_id for m in e_pad.models] == \
           [m.model_id for m in e_exact.models]
    assert len(e_pad.models) >= 2
    np.testing.assert_allclose(np.asarray(e_pad.models[0].state.pose),
                               np.asarray(e_exact.models[0].state.pose),
                               atol=1e-3)
    for mp, me in zip(e_pad.models, e_exact.models):
        assert abs(mp.surfel_count - me.surfel_count) <= \
            max(16, 0.01 * me.surfel_count)
    est_p = np.asarray(e_pad.models[1].pose_log[-1]["pose"][:3, 3])
    est_e = np.asarray(e_exact.models[1].pose_log[-1]["pose"][:3, 3])
    assert est_p[0] > 0.005 and est_e[0] > 0.005
    assert np.abs(est_p - est_e).max() < 0.01


def test_windowed_objects_match_full_frame():
    """Object-window passes (engine.fuse_clean_predict_obj_win: static
    (OW,OW) crops with principal-point-shifted intrinsics) must reproduce
    the full-frame object path — the window always contains the object's
    mask + margin, so fuse/clean/predict see the same pixels.  The
    reference runs every model full-frame (MaskFusion.cpp:539-569); the
    window is the TPU redesign that makes small objects cheap."""
    # margin 24 mirrors production geometry (default 32 at VGA): the
    # photometric gates read a ~6 px halo at the coarsest level, so the
    # mask must stay >= 24 px inside the window for the windowed pass to
    # reproduce full-frame results under the blended tracker
    e_full = run(True, object_window=0)
    e_win = run(True, object_window=104)
    assert [m.model_id for m in e_win.models] == \
           [m.model_id for m in e_full.models]
    assert len(e_win.models) >= 2
    assert e_win.models[1].window is not None  # windowing actually engaged
    for mw, mf in zip(e_win.models, e_full.models):
        np.testing.assert_allclose(np.asarray(mw.state.pose),
                                   np.asarray(mf.state.pose), atol=2e-4)
        assert abs(mw.surfel_count - mf.surfel_count) <= \
            max(4, int(0.02 * mf.surfel_count)), (
            mw.model_id, mw.surfel_count, mf.surfel_count)


def test_padded_slots_with_windowing_disabled():
    """min_object_slots with the object window OFF (object_window=0, or the
    default 320 window at a resolution smaller than the window): the padded
    graphs must run full-frame object passes, not dynamic-slice a zero-size
    window (regression: the 320x240 two-object bench repro crashed with
    'Cannot apply edge padding to empty axis' in track_objects_win because
    `windowed` ignored self._obj_window when min_object_slots forced the
    slot class nonzero before any object existed)."""
    eng = run(True, n_frames=6, min_object_slots=2)
    assert len(eng.models) >= 2
    est = np.asarray(eng.models[1].pose_log[-1]["pose"][:3, 3])
    assert est[0] > 0.005


def test_prewarm_next_buckets_pipelined():
    """The pipelined device/fuse graphs prewarm their pow2 growth rungs on
    BOTH bucket axes (global x object), including the prefused fuse stage's
    keyword-recorded gate/ids_guard traced args — a positional capture
    would misbind those onto the static bucket parameters at lower() time."""
    cfg = Config(
        global_surfel_capacity=1 << 19,
        object_surfel_capacity=1 << 13,
        seg_method="maskfusion",
        use_so3=False,
        model_spawn_offset=0,
        pipelined_multiobject=True,
        fuse_mask_lag=True,
        min_object_slots=2,
    )
    eng = MaskFusion(Resolution(syn.W, syn.H), syn.DEFAULT_INTR, cfg)
    for i in range(4):
        pts, cols, labels = syn.make_scene_with_object()
        rgb, depth, lab = syn.render(pts, cols, np.eye(4, dtype=np.float32),
                                     syn.DEFAULT_INTR, labels=labels)
        eng.process_frame(FrameData(rgb=rgb, depth=depth, mask=lab,
                                    class_ids=[0, 7], timestamp=float(i)))
    eng.drain_pipeline()
    assert "device_stage" in eng._prewarm_ex
    assert "fuse_stage" in eng._prewarm_ex
    # object capacity (1<<13) sits at the bucket floor -> no object rungs;
    # the global axis has one pow2 rung.  device_stage: 1 variant;
    # fuse_stage (+_lag if recorded): 1 rung x 2 parities each.
    n = eng.prewarm_next_buckets(_lower_only=True)
    expected = 1 + 2 * sum(1 for k in eng._prewarm_ex if "fuse" in k)
    assert n == expected, (n, expected, list(eng._prewarm_ex))
