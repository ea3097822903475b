"""Co-Fusion segmentation method: SLIC + dense-CRF motion segmentation."""

import numpy as np
import jax.numpy as jnp

from maskfusion_tpu.camera import Resolution
from maskfusion_tpu.config import Config
from maskfusion_tpu.ops import slic as slic_ops
from maskfusion_tpu.segmentation.cf_segmentation import (
    CfSegmentation, dense_crf_meanfield,
)
from maskfusion_tpu.frame import FrameData
from tests import synthetic as syn


def test_slic_superpixels():
    pts, cols = syn.make_scene()
    rgb, depth = syn.render(pts, cols, np.eye(4), syn.DEFAULT_INTR)
    s = slic_ops.slic(jnp.asarray(rgb), spacing=16, iterations=3)
    gh, gw = s.grid_hw
    labels = np.asarray(s.labels)
    assert labels.min() >= 0 and labels.max() < gh * gw
    # superpixels stay local: mean position of each cluster near its grid cell
    counts = np.asarray(s.counts)
    assert (counts > 0).mean() > 0.9
    sizes_ok = (counts[counts > 0] > 16) & (counts[counts > 0] < 16 * 16 * 6)
    assert sizes_ok.mean() > 0.9
    # downsample/upsample round trip on a constant map
    const = jnp.full((syn.H, syn.W), 3.5)
    low = slic_ops.downsample(const, s.labels, gh * gw)
    up = slic_ops.upsample(low, s.labels)
    np.testing.assert_allclose(np.asarray(up), 3.5, atol=1e-5)


def test_dense_crf_smooths_noisy_unaries():
    # two spatial halves with noisy unaries -> CRF should yield clean halves
    rng = np.random.default_rng(0)
    gh, gw = 12, 16
    n = gh * gw
    yy, xx = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    true = (xx > gw // 2).astype(int).reshape(-1)
    unary = np.zeros((2, n), np.float32)
    noise = rng.normal(0, 1.2, n)
    unary[0] = np.where(true == 0, 0.2, 2.0) + noise
    unary[1] = np.where(true == 1, 0.2, 2.0) - noise
    pos = np.stack([yy.reshape(-1), xx.reshape(-1)], -1).astype(np.float32)
    feats_app = np.concatenate([pos * 0.3, np.zeros((n, 1))], 1)
    q = dense_crf_meanfield(jnp.asarray(unary), jnp.asarray(feats_app),
                            jnp.asarray(pos / 2.0), 3.0, 2.0, 8)
    pred = np.asarray(jnp.argmax(q, 0))
    noisy_acc = (np.argmin(unary, 0) == true).mean()
    crf_acc = (pred == true).mean()
    assert crf_acc > noisy_acc
    assert crf_acc > 0.9


def test_cfsegmentation_segments_misaligned_object():
    """An object whose alignment error is high vs the background model
    should be segmented out."""
    cfg = Config(seg_method="cofusion")
    seg = CfSegmentation(cfg, Resolution(syn.W, syn.H), syn.DEFAULT_INTR)
    pts, cols, labels = syn.make_scene_with_object(offset=np.array([0.04, 0, 0]))
    rgb, depth, lab = syn.render(pts, cols, np.eye(4), syn.DEFAULT_INTR,
                                 labels=labels)
    frame = FrameData(rgb=rgb, depth=depth, timestamp=0.0)

    class M:
        model_id = 0
        class_id = -1

    # synthetic views: background model has high error on the object region
    err = np.where(lab == 1, 0.5, 0.001).astype(np.float32)
    conf = np.ones((syn.H, syn.W), np.float32)
    res = seg.perform(
        frame, None, None, np.zeros((syn.H, syn.W), np.uint8),
        [M()], next_model_id=1, allow_new=True,
        model_views=[{"error": err, "conf": conf}],
    )
    assert res.has_new_label
    out = res.full_segmentation
    inter = ((out == 1) & (lab == 1)).sum()
    union = ((out == 1) | (lab == 1)).sum()
    iou = inter / max(union, 1)
    assert iou > 0.5, f"cofusion IoU {iou}"
