"""Boundary semantics of the vectorised MfSegmentation rules
(MfSegmentation.cpp:310-344 component->mask 0.65 rule, :496-522 leftover
0.6 rule).  The vectorised forms must preserve the reference's STRICT
inequalities and first-hit behaviour."""

import numpy as np
import pytest

from maskfusion_tpu.camera import CameraIntrinsics, Resolution
from maskfusion_tpu.config import Config
from maskfusion_tpu.frame import FrameData
from maskfusion_tpu.segmentation.mf_segmentation import (MfSegmentation,
                                                         ModelInfo)

S = 64


@pytest.fixture()
def seg():
    cfg = Config(seg_method="maskfusion", seg_min_mapped_component_size=8,
                 # keep CC deterministic: no edge reassignment rounds
                 seg_edge_reassign_iters=0)
    return MfSegmentation(cfg, Resolution(S, S),
                          CameraIntrinsics(52.8, 52.8, 32.0, 32.0))


def _run(seg, mask, class_ids, ids, models, nonedge, allow_new=True,
         next_id=None):
    depth = np.full((S, S), 2.0, np.float32)
    frame = FrameData(rgb=np.zeros((S, S, 3), np.uint8), depth=depth,
                      mask=mask, class_ids=class_ids)
    if next_id is None:
        next_id = max(m.model_id for m in models) + 1
    return seg.perform(frame, None, None, ids, models, next_id, allow_new,
                       nonedge=nonedge)


def test_065_rule_strict_inequality(seg):
    """A mask holding exactly 65% of a component must NOT claim it."""
    # one 40x40 component (1600 px) split from the background by an edge
    nonedge = np.zeros((S, S), bool)
    nonedge[2:42, 2:42] = True
    ids = np.zeros((S, S), np.uint8)
    models = [ModelInfo(0, 0)]
    # mask 1 covers exactly 65% of the component (1040 of 1600 px)
    mask = np.zeros((S, S), np.uint8)
    comp_px = [(y, x) for y in range(2, 42) for x in range(2, 42)]
    for (y, x) in comp_px[:1040]:
        mask[y, x] = 1
    res = _run(seg, mask, [0, 7], ids, models, nonedge)
    assert not res.has_new_label          # 1040 == 0.65*1600, not >
    # one more pixel tips it over
    y, x = comp_px[1040]
    mask[y, x] = 1
    res = _run(seg, mask, [0, 7], ids, models, nonedge)
    assert res.has_new_label
    assert res.model_data[-1].pixel_count == 1600   # whole component


def test_two_masks_cannot_both_claim(seg):
    """50/50 split: neither mask exceeds 65%, component stays background."""
    nonedge = np.zeros((S, S), bool)
    nonedge[2:42, 2:42] = True
    ids = np.zeros((S, S), np.uint8)
    mask = np.zeros((S, S), np.uint8)
    mask[2:42, 2:22] = 1
    mask[2:42, 22:42] = 2
    res = _run(seg, mask, [0, 7, 8], ids, [ModelInfo(0, 0)], nonedge)
    assert not res.has_new_label
    assert (res.full_segmentation == 0).all()


def test_small_component_never_mapped(seg):
    """Components at or below seg_min_mapped_component_size are skipped."""
    nonedge = np.zeros((S, S), bool)
    nonedge[4:6, 4:8] = True       # 8 px == threshold, strict > required
    ids = np.zeros((S, S), np.uint8)
    mask = np.zeros((S, S), np.uint8)
    mask[4:6, 4:8] = 1
    res = _run(seg, mask, [0, 7], ids, [ModelInfo(0, 0)], nonedge)
    assert not res.has_new_label


def test_leftover_06_rule_tracks_projection(seg):
    """An unmasked component >60% covered by a model's projection adopts
    that model's id; the global model (id 0) never claims leftovers."""
    nonedge = np.zeros((S, S), bool)
    nonedge[2:42, 2:42] = True     # 1600 px component, no masks at all
    ids = np.zeros((S, S), np.uint8)
    ids[2:42, 2:34] = 5            # model 5 projects onto 80% of it
    models = [ModelInfo(0, 0), ModelInfo(5, 7)]
    res = _run(seg, np.zeros((S, S), np.uint8), [], ids, models, nonedge)
    assert (res.full_segmentation[2:42, 2:42] == 5).all()
    # global projection (id 0) dominant -> stays background
    ids2 = np.zeros((S, S), np.uint8)
    ids2[2:42, 2:10] = 5
    res = _run(seg, np.zeros((S, S), np.uint8), [], ids2, models, nonedge)
    assert (res.full_segmentation == 0).all()


def test_person_class_becomes_ignore(seg):
    cfg = seg.cfg
    nonedge = np.zeros((S, S), bool)
    nonedge[2:42, 2:42] = True
    ids = np.zeros((S, S), np.uint8)
    mask = np.zeros((S, S), np.uint8)
    mask[2:42, 2:42] = 1
    res = _run(seg, mask, [0, cfg.person_class_id], ids,
               [ModelInfo(0, 0)], nonedge)
    assert not res.has_new_label
    assert (res.full_segmentation[2:42, 2:42] == 255).all()


def test_depth_stats_match_masked_moments(seg):
    nonedge = np.zeros((S, S), bool)
    nonedge[2:42, 2:42] = True
    ids = np.zeros((S, S), np.uint8)
    ids[2:42, 2:42] = 5
    models = [ModelInfo(0, 0), ModelInfo(5, 7)]
    depth = (2.0 + 0.01 * np.arange(S * S).reshape(S, S) % 1.3).astype(
        np.float32)
    frame = FrameData(rgb=np.zeros((S, S, 3), np.uint8), depth=depth,
                      mask=None, class_ids=None)
    res = seg.perform(frame, None, None, ids, models, 6, False,
                      nonedge=nonedge)
    md = res.data_for(5)
    sel = (res.full_segmentation == 5) & (depth > 0)
    assert md.pixel_count == int(sel.sum())
    assert md.depth_mean == pytest.approx(float(depth[sel].mean()), abs=1e-5)
    assert md.depth_std == pytest.approx(float(depth[sel].std()), abs=1e-5)
