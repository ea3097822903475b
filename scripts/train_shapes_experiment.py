"""Experiment: train micro Mask R-CNN on synthetic shapes (CPU), check
loss curve, detection quality, and step time — to calibrate the CI test."""
import sys
sys.path.insert(0, "/root/repo")
import cpu_mode  # noqa: F401  (force CPU backend)
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from maskfusion_tpu.maskrcnn.model import MaskRCNN, MaskRCNNConfig
from maskfusion_tpu.maskrcnn.synthetic_shapes import (
    box_iou_np, make_shapes_scene,
)

MICRO = MaskRCNNConfig(
    num_classes=3, image_size=64,
    anchor_scales=(8, 16, 32, 64, 128),
    anchor_ratios=(1.0,),
    pre_nms_limit=128, post_nms_proposals=32, max_detections=4,
    roi_pool_size=7, mask_pool_size=7,
    fpn_channels=32, box_head_dim=64, mask_head_channels=32,
    backbone_blocks=(1, 1, 1, 1),
    train_rois=16, score_threshold=0.0,
    dtype=jnp.float32,
)

model = MaskRCNN(MICRO)
rng = np.random.default_rng(0)
img0, b0, c0, v0, m0 = make_shapes_scene(rng, MICRO.image_size)
params = model.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, MICRO.image_size, MICRO.image_size, 3)))
n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
print("params:", n_params)

tx = optax.adam(2e-3)
opt = tx.init(params)


@jax.jit
def step(params, opt, key, img, boxes, classes, valid, masks):
    def loss_fn(p):
        out = model.apply(p, img[None], boxes, classes, valid, masks, key,
                          method=MaskRCNN.train_losses)
        return out["total"], out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    upd, opt = tx.update(grads, opt, params)
    return optax.apply_updates(params, upd), opt, loss, out


t0 = time.perf_counter()
losses = []
for i in range(150):
    img, b, c, v, m = make_shapes_scene(rng, MICRO.image_size)
    params, opt, loss, out = step(
        params, opt, jax.random.PRNGKey(i), jnp.asarray(img), jnp.asarray(b),
        jnp.asarray(c), jnp.asarray(v), jnp.asarray(m))
    losses.append(float(loss))
    if i == 0:
        print(f"compile+step0: {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
    if i % 10 == 0:
        print(i, {k: round(float(x), 3) for k, x in out.items()}, flush=True)
print(f"per-step: {(time.perf_counter()-t0)/149*1000:.0f} ms")

# ---- eval ----
fwd = jax.jit(lambda p, im: model.apply(p, im))
ious, cls_ok, mask_ious = [], [], []
for i in range(8):
    img, b, c, v, m = make_shapes_scene(rng, MICRO.image_size, max_objects=1)
    out = fwd(params, jnp.asarray(img)[None])
    scores = np.asarray(out["detection_scores"])
    k = int(np.argmax(scores))
    det = np.asarray(out["detections"])[k]
    iou = box_iou_np(det, b[0])
    ious.append(iou)
    cls_ok.append(int(np.asarray(out["detection_classes"])[k]) == int(c[0]))
    # mask iou inside the detected box vs gt mask cropped
    print(f"eval{i}: iou={iou:.2f} score={scores[k]:.2f} "
          f"cls={int(np.asarray(out['detection_classes'])[k])} gt={int(c[0])}")
print("mean IoU:", np.mean(ious), "cls acc:", np.mean(cls_ok))
print("loss first10:", np.mean(losses[:10]), "last10:", np.mean(losses[-10:]))
