import numpy as np
import jax
import jax.numpy as jnp
import pytest

from maskfusion_tpu.maskrcnn.model import (
    MaskRCNN, MaskRCNNConfig, apply_deltas, box_iou, generate_anchors,
    nms_fixed, rpn_loss,
)
from maskfusion_tpu.maskrcnn.inference import (
    FrameQueue, MaskRCNNInference, generate_id_image,
)
from maskfusion_tpu.frame import FrameData

TINY = MaskRCNNConfig(
    num_classes=5, image_size=128,
    anchor_scales=(16, 32, 64, 128, 256),
    pre_nms_limit=128, post_nms_proposals=32, max_detections=8,
    dtype=jnp.float32,
)


def test_anchors_cover_image():
    a = generate_anchors(TINY)
    n_expected = sum((TINY.image_size // (4 * 2 ** l)) ** 2 * 3
                     for l in range(5))
    assert a.shape == (n_expected, 4)
    centers_y = (a[:, 0] + a[:, 2]) / 2
    assert centers_y.min() > 0 and centers_y.max() < 1


def test_box_iou_and_deltas():
    a = jnp.array([[0.0, 0.0, 0.5, 0.5]])
    b = jnp.array([[0.0, 0.0, 0.5, 0.5], [0.25, 0.25, 0.75, 0.75],
                   [0.6, 0.6, 0.9, 0.9]])
    iou = np.asarray(box_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 0.0625 / 0.4375, 0.0], atol=1e-5)
    # identity deltas keep the box
    out = np.asarray(apply_deltas(b, jnp.zeros((3, 4))))
    np.testing.assert_allclose(out, np.asarray(b), atol=1e-6)


def test_nms():
    boxes = jnp.array([
        [0.0, 0.0, 0.4, 0.4],
        [0.01, 0.01, 0.41, 0.41],   # overlaps first
        [0.6, 0.6, 0.9, 0.9],
    ])
    scores = jnp.array([0.9, 0.8, 0.7])
    sel, valid = nms_fixed(boxes, scores, 3, 0.5)
    sel, valid = np.asarray(sel), np.asarray(valid)
    assert valid[0] and valid[1] and not valid[2]
    assert sel[0] == 0 and sel[1] == 2


def test_forward_shapes():
    model = MaskRCNN(TINY)
    img = jnp.zeros((1, 128, 128, 3))
    params = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(params, img)
    assert out["proposals"].shape == (32, 4)
    assert out["detections"].shape == (8, 4)
    assert out["detection_classes"].shape == (8,)
    assert out["mask_logits"].shape == (8, TINY.mask_pool_size * 2,
                                        TINY.mask_pool_size * 2)
    assert np.isfinite(np.asarray(out["class_logits"])).all()


def test_rpn_loss_decreases_with_gradient_step():
    model = MaskRCNN(TINY)
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (1, 128, 128, 3)),
                      jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img)
    anchors = jnp.asarray(generate_anchors(TINY))
    gt_boxes = jnp.array([[0.2, 0.2, 0.6, 0.6]])
    gt_valid = jnp.array([True])

    def loss_fn(p):
        out = model.apply(p, img)
        return rpn_loss(out["rpn_logits"][0], out["rpn_deltas"][0],
                        anchors, gt_boxes, gt_valid, TINY)

    l0, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(l0))
    gnorm = jnp.sqrt(sum(jnp.sum(g * g) for g in jax.tree.leaves(grads)))
    assert float(gnorm) > 0
    # normalised tiny step along -grad must reduce the loss
    params2 = jax.tree.map(lambda p, g: p - (1e-3 / gnorm) * g, params, grads)
    l1 = loss_fn(params2)
    assert float(l1) < float(l0)


def test_generate_id_image():
    H, W = 60, 80
    boxes = np.array([[0.1, 0.1, 0.5, 0.5], [0.4, 0.4, 0.9, 0.9],
                      [0.0, 0.0, 0.2, 0.2]])
    masks = np.ones((3, 28, 28), np.float32)  # logits > 0 everywhere
    classes = np.array([7, 3, 5])
    scores = np.array([0.9, 0.8, 0.3])
    valid = np.array([True, True, True])
    id_img, class_ids, rois = generate_id_image(
        boxes, masks, classes, scores, valid, H, W, score_threshold=0.55)
    assert class_ids == [0, 7, 3]          # third filtered by score
    assert (id_img == 1).sum() > 0 and (id_img == 2).sum() > 0
    assert (id_img == 3).sum() == 0
    # overlap region belongs to the higher-score instance
    assert id_img[int(0.45 * H), int(0.45 * W)] == 1


def test_frame_queue_delay_semantics():
    q = FrameQueue(size=3)
    frames = [FrameData(rgb=np.zeros((4, 4, 3), np.uint8),
                        depth=np.zeros((4, 4), np.float32), index=i)
              for i in range(4)]
    q.push(frames[0])
    q.push(frames[1])
    assert q.pop_ready() is None           # unlabelled, queue not full
    assert q.newest_unlabelled() is frames[1]
    frames[0].mask = np.zeros((4, 4), np.uint8)
    assert q.pop_ready() is frames[0]      # labelled head pops
    q.push(frames[2])
    q.push(frames[3])
    assert q.pop_ready() is frames[1]      # queue full -> forced pop
