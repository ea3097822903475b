"""Mask R-CNN as a JAX/flax inference+training graph.

TPU-native replacement for the reference's embedded TF1.8/Keras matterport
Mask_RCNN (Core/Segmentation/MaskRCNN/MaskRCNN.py.in + helpers.py): ResNet50
-FPN backbone, RPN, ROIAlign, box/class head, mask head.  Everything is
statically shaped (fixed proposal/detection counts, padded with validity
masks) so the whole network jits once and runs on the MXU in bfloat16.

This is a from-scratch implementation of the standard architecture (He et
al., ICCV 2017); the config surface (class names, score threshold 0.55,
class filter) mirrors the reference's config.toml.in:4-36.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MaskRCNNConfig:
    num_classes: int = 81                  # COCO (matterport default)
    image_size: int = 512                  # square, padded
    # anchors
    anchor_scales: Tuple[int, ...] = (32, 64, 128, 256, 512)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_stride: int = 1
    # proposals / detections (static shapes)
    pre_nms_limit: int = 1024
    post_nms_proposals: int = 256
    max_detections: int = 100
    rpn_nms_threshold: float = 0.7
    detection_nms_threshold: float = 0.3
    score_threshold: float = 0.55          # config.toml.in:33
    # heads
    roi_pool_size: int = 7
    mask_pool_size: int = 14
    fpn_channels: int = 256
    box_head_dim: int = 1024               # matterport FPN_CLASSIF_FC_LAYERS
    mask_head_channels: int = 256
    # backbone (matterport supports resnet50/101 via stage block counts)
    backbone_blocks: Tuple[int, ...] = (3, 4, 6, 3)
    # norm layer: "gn" (from-scratch training) or "frozen_bn" (inference
    # with converted matterport weights, which bake BatchNorm statistics)
    norm: str = "gn"
    # train
    rpn_positive_iou: float = 0.7
    rpn_negative_iou: float = 0.3
    train_rois: int = 64                   # matterport TRAIN_ROIS_PER_IMAGE
    roi_positive_ratio: float = 0.33
    roi_positive_iou: float = 0.5
    # box-delta normalisation (matterport BBOX_STD_DEV / RPN_BBOX_STD_DEV)
    bbox_std: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    dtype: Any = jnp.bfloat16


# --------------------------------------------------------------------------
# Backbone: ResNet-50/101 + FPN
# --------------------------------------------------------------------------

class FrozenBatchNorm(nn.Module):
    """BatchNorm applied as a fixed affine transform from stored statistics —
    what matterport's inference graph computes (BN layers run in inference
    mode, MaskRCNN.py.in model config); weight conversion fills
    scale/bias/mean/var from the .h5 (gamma/beta/moving_mean/moving_var)."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        inv = scale / jnp.sqrt(var + 1e-5)
        return x * inv.astype(x.dtype) + (bias - mean * inv).astype(x.dtype)


def make_norm(cfg: MaskRCNNConfig, channels: int):
    if cfg.norm == "frozen_bn":
        return FrozenBatchNorm(dtype=cfg.dtype)
    # cap at 32 groups but keep groups >= 8 channels wide: tiny groups are
    # degenerate (a 2-channel group normalises every pair to +-1, erasing
    # the activations — observed as a content-blind box head)
    groups = min(32, max(1, channels // 8))
    while channels % groups:
        groups -= 1
    return nn.GroupNorm(num_groups=groups, dtype=cfg.dtype)


class Bottleneck(nn.Module):
    cfg: MaskRCNNConfig
    filters: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.cfg.dtype
        residual = x
        y = nn.Conv(self.filters, (1, 1),
                    strides=(self.stride, self.stride),
                    dtype=dt, use_bias=True)(x)
        y = make_norm(self.cfg, self.filters)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), dtype=dt, use_bias=True)(y)
        y = make_norm(self.cfg, self.filters)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), dtype=dt,
                    use_bias=True)(y)
        y = make_norm(self.cfg, self.filters * 4)(y)
        if residual.shape[-1] != self.filters * 4 or self.stride != 1:
            residual = nn.Conv(self.filters * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               dtype=dt, use_bias=True)(residual)
            residual = make_norm(self.cfg, self.filters * 4)(residual)
        return nn.relu(y + residual)


class ResNetFPN(nn.Module):
    """ResNet-50/101 + FPN producing P2..P6 at strides 4..64.

    Structure follows matterport's resnet_graph (stride on the 1x1 branch2a
    conv, branch1 downsample on each stage's first block) so converted
    weights drop in layer-for-layer."""
    cfg: MaskRCNNConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.cfg.dtype
        x = x.astype(dt)
        # matterport: ZeroPadding2D(3) + 7x7/2 VALID (not SAME — explicit
        # padding keeps converted weights pixel-aligned)
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="VALID",
                    dtype=dt, use_bias=True)(x)
        x = make_norm(self.cfg, 64)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        def stage(x, filters, blocks, stride):
            x = Bottleneck(self.cfg, filters, stride)(x, train)
            for _ in range(blocks - 1):
                x = Bottleneck(self.cfg, filters, 1)(x, train)
            return x

        b = self.cfg.backbone_blocks
        c2 = stage(x, 64, b[0], 1)     # stride 4
        c3 = stage(c2, 128, b[1], 2)   # stride 8
        c4 = stage(c3, 256, b[2], 2)   # stride 16
        c5 = stage(c4, 512, b[3], 2)   # stride 32

        ch = self.cfg.fpn_channels
        p5 = nn.Conv(ch, (1, 1), dtype=dt)(c5)
        p4 = nn.Conv(ch, (1, 1), dtype=dt)(c4) + jax.image.resize(
            p5, (p5.shape[0], c4.shape[1], c4.shape[2], ch), "nearest")
        p3 = nn.Conv(ch, (1, 1), dtype=dt)(c3) + jax.image.resize(
            p4, (p4.shape[0], c3.shape[1], c3.shape[2], ch), "nearest")
        p2 = nn.Conv(ch, (1, 1), dtype=dt)(c2) + jax.image.resize(
            p3, (p3.shape[0], c2.shape[1], c2.shape[2], ch), "nearest")
        p2 = nn.Conv(ch, (3, 3), dtype=dt)(p2)
        p3 = nn.Conv(ch, (3, 3), dtype=dt)(p3)
        p4 = nn.Conv(ch, (3, 3), dtype=dt)(p4)
        p5 = nn.Conv(ch, (3, 3), dtype=dt)(p5)
        p6 = nn.max_pool(p5, (1, 1), strides=(2, 2))
        return [p2, p3, p4, p5, p6]


# --------------------------------------------------------------------------
# RPN
# --------------------------------------------------------------------------

class RPNHead(nn.Module):
    cfg: MaskRCNNConfig

    @nn.compact
    def __call__(self, feats):
        dt = self.cfg.dtype
        n_anchors = len(self.cfg.anchor_ratios)
        shared = nn.Conv(self.cfg.fpn_channels, (3, 3), dtype=dt,
                         name="rpn_conv")
        cls = nn.Conv(n_anchors * 2, (1, 1), dtype=dt, name="rpn_cls")
        box = nn.Conv(n_anchors * 4, (1, 1), dtype=dt, name="rpn_box")
        logits, deltas = [], []
        for f in feats:
            h = nn.relu(shared(f))
            B = f.shape[0]
            logits.append(cls(h).reshape(B, -1, 2))
            deltas.append(box(h).reshape(B, -1, 4))
        return (jnp.concatenate(logits, axis=1).astype(jnp.float32),
                jnp.concatenate(deltas, axis=1).astype(jnp.float32))


def generate_anchors(cfg: MaskRCNNConfig) -> np.ndarray:
    """All anchors over the FPN pyramid, normalised [y1, x1, y2, x2]."""
    S = cfg.image_size
    anchors = []
    for lvl, scale in enumerate(cfg.anchor_scales):
        stride = 4 * (2 ** lvl)
        fs = S // stride
        ys = (np.arange(fs) + 0.5) * stride
        xs = (np.arange(fs) + 0.5) * stride
        cy, cx = np.meshgrid(ys, xs, indexing="ij")
        for ratio in cfg.anchor_ratios:
            h = scale / np.sqrt(ratio)
            w = scale * np.sqrt(ratio)
            a = np.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], -1)
            anchors.append(a.reshape(-1, 4))
    # interleave per position to match the head's reshape order:
    # per level, (H*W, n_ratios, 4)
    out = []
    for lvl in range(len(cfg.anchor_scales)):
        per_ratio = anchors[lvl * len(cfg.anchor_ratios):
                            (lvl + 1) * len(cfg.anchor_ratios)]
        out.append(np.stack(per_ratio, axis=1).reshape(-1, 4))
    return (np.concatenate(out, 0) / S).astype(np.float32)


def apply_deltas(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Standard (dy, dx, log dh, log dw) box refinement."""
    h = boxes[..., 2] - boxes[..., 0]
    w = boxes[..., 3] - boxes[..., 1]
    cy = boxes[..., 0] + h / 2
    cx = boxes[..., 1] + w / 2
    cy = cy + deltas[..., 0] * h
    cx = cx + deltas[..., 1] * w
    h = h * jnp.exp(jnp.clip(deltas[..., 2], -4, 4))
    w = w * jnp.exp(jnp.clip(deltas[..., 3], -4, 4))
    return jnp.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], -1)


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) x (M, 4) -> (N, M) IoU."""
    y1 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    x1 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    y2 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    x2 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    inter = jnp.clip(y2 - y1, 0) * jnp.clip(x2 - x1, 0)
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-10)


def nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray, k: int,
              iou_threshold: float) -> jnp.ndarray:
    """Greedy NMS with static output size: returns indices (k,) into boxes
    (invalid slots point at argmax-score with score masked; callers use the
    returned validity).  O(k*N) — fine for k<=~300 on the VPU."""
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)

    def body(i, carry):
        sel_idx, sel_valid, live_scores = carry
        best = jnp.argmax(live_scores)
        best_score = live_scores[best]
        valid = best_score > -jnp.inf
        sel_idx = sel_idx.at[i].set(best)
        sel_valid = sel_valid.at[i].set(valid)
        suppress = iou[best] > iou_threshold
        live_scores = jnp.where(suppress, -jnp.inf, live_scores)
        live_scores = live_scores.at[best].set(-jnp.inf)
        return sel_idx, sel_valid, live_scores

    init = (jnp.zeros(k, jnp.int32), jnp.zeros(k, bool), scores)
    sel_idx, sel_valid, _ = jax.lax.fori_loop(0, k, body, init)
    return sel_idx, sel_valid


def roi_align(feats, boxes: jnp.ndarray, out_size: int,
              cfg: MaskRCNNConfig) -> jnp.ndarray:
    """Multi-level ROIAlign: assign each box to an FPN level by area
    (matterport's log2 rule) and bilinearly sample an out_size^2 grid."""
    N = boxes.shape[0]
    h = jnp.clip(boxes[:, 2] - boxes[:, 0], 1e-6)
    w = jnp.clip(boxes[:, 3] - boxes[:, 1], 1e-6)
    # level assignment: sqrt(area) ~ 224px -> P4
    lvl = jnp.floor(4 + jnp.log2(jnp.sqrt(h * w) * cfg.image_size / 224.0))
    lvl = jnp.clip(lvl, 2, 5).astype(jnp.int32) - 2     # 0..3 -> P2..P5

    ys = jnp.linspace(0.0, 1.0, out_size)
    xs = jnp.linspace(0.0, 1.0, out_size)
    gy = boxes[:, 0:1] + ys[None, :] * h[:, None]        # (N, S)
    gx = boxes[:, 1:2] + xs[None, :] * w[:, None]

    def sample_level(fmap):
        """Bilinear sample fmap (H, W, C) at (N, S, S) grid."""
        H, W, C = fmap.shape
        fy = gy * H - 0.5
        fx = gx * W - 0.5
        y0 = jnp.floor(fy).astype(jnp.int32)
        x0 = jnp.floor(fx).astype(jnp.int32)
        wy = fy - y0
        wx = fx - x0

        def g(yi, xi):
            yi = jnp.clip(yi, 0, H - 1)
            xi = jnp.clip(xi, 0, W - 1)
            flat = fmap.reshape(H * W, C)
            idx = yi[:, :, None] * W + xi[:, None, :]    # (N, S, S)
            return flat[idx.reshape(N, -1)].reshape(N, out_size, out_size, C)

        v00 = g(y0, x0)
        v01 = g(y0, x0 + 1)
        v10 = g(y0 + 1, x0)
        v11 = g(y0 + 1, x0 + 1)
        wy_ = wy[:, :, None, None]
        wx_ = wx[:, None, :, None]
        return (v00 * (1 - wy_) * (1 - wx_) + v01 * (1 - wy_) * wx_
                + v10 * wy_ * (1 - wx_) + v11 * wy_ * wx_)

    pooled = jnp.stack([sample_level(f[0]) for f in feats[:4]], axis=0)
    return jnp.take_along_axis(
        pooled, lvl[None, :, None, None, None], axis=0
    )[0]


class BoxHead(nn.Module):
    """fpn_classifier_graph equivalent: the 7x7 'conv' collapses to a Dense
    over the flattened roi (weights are reshape-compatible for conversion);
    matterport puts a BN after each fc (mrcnn_class_bn1/2)."""
    cfg: MaskRCNNConfig

    @nn.compact
    def __call__(self, rois):
        dt = self.cfg.dtype
        d = self.cfg.box_head_dim
        x = rois.reshape(rois.shape[0], -1).astype(dt)
        x = nn.Dense(d, dtype=dt, name="fc1")(x)
        x = make_norm(self.cfg, d)(x)
        x = nn.relu(x)
        x = nn.Dense(d, dtype=dt, name="fc2")(x)
        x = make_norm(self.cfg, d)(x)
        x = nn.relu(x)
        logits = nn.Dense(self.cfg.num_classes, dtype=dt, name="cls")(x)
        deltas = nn.Dense(self.cfg.num_classes * 4, dtype=dt, name="box")(x)
        return (logits.astype(jnp.float32),
                deltas.reshape(-1, self.cfg.num_classes, 4).astype(jnp.float32))


class MaskHead(nn.Module):
    """build_fpn_mask_graph equivalent (4x conv+BN, deconv, 1x1 sigmoid
    head — the sigmoid is applied by the loss/consumer)."""
    cfg: MaskRCNNConfig

    @nn.compact
    def __call__(self, rois):
        dt = self.cfg.dtype
        ch = self.cfg.mask_head_channels
        x = rois.astype(dt)
        for i in range(4):
            x = nn.Conv(ch, (3, 3), dtype=dt, name=f"conv{i + 1}")(x)
            x = make_norm(self.cfg, ch)(x)
            x = nn.relu(x)
        x = nn.relu(nn.ConvTranspose(ch, (2, 2), strides=(2, 2), dtype=dt,
                                     name="deconv")(x))
        x = nn.Conv(self.cfg.num_classes, (1, 1), dtype=dt, name="out")(x)
        return x.astype(jnp.float32)


class MaskRCNN(nn.Module):
    cfg: MaskRCNNConfig

    def setup(self):
        self.backbone = ResNetFPN(self.cfg)
        self.rpn = RPNHead(self.cfg)
        self.box_head = BoxHead(self.cfg)
        self.mask_head = MaskHead(self.cfg)
        self.anchors = jnp.asarray(generate_anchors(self.cfg))

    def _normalise(self, image):
        if self.cfg.norm == "frozen_bn":
            # matterport mold_image: RGB mean-pixel subtraction
            return image - jnp.asarray([123.7, 116.8, 103.9], jnp.float32)
        return (image - 127.5) / 127.5

    def _proposals(self, rpn_logits, rpn_deltas):
        """RPN scores + deltas -> post_nms_proposals boxes (single image)."""
        cfg = self.cfg
        scores = jax.nn.softmax(rpn_logits, axis=-1)[:, 1]
        k = min(cfg.pre_nms_limit, scores.shape[0])
        top_scores, top_idx = jax.lax.top_k(scores, k)
        std = jnp.asarray(cfg.bbox_std, jnp.float32)
        boxes = apply_deltas(self.anchors[top_idx],
                             rpn_deltas[top_idx] * std)
        boxes = jnp.clip(boxes, 0.0, 1.0)
        sel, valid = nms_fixed(boxes, top_scores, cfg.post_nms_proposals,
                               cfg.rpn_nms_threshold)
        props = boxes[sel]
        return jnp.where(valid[:, None], props, 0.0), valid

    def __call__(self, image, train: bool = False):
        """image: (1, S, S, 3) float32 in [0, 255].  Returns dict with
        proposals, detections (boxes/classes/scores/valid) and per-detection
        mask logits."""
        cfg = self.cfg
        x = self._normalise(image)
        feats = self.backbone(x, train)
        rpn_logits, rpn_deltas = self.rpn(feats)

        out = {"rpn_logits": rpn_logits, "rpn_deltas": rpn_deltas}
        props, prop_valid = self._proposals(rpn_logits[0], rpn_deltas[0])
        out["proposals"] = props
        out["proposal_valid"] = prop_valid

        rois = roi_align(feats, props, cfg.roi_pool_size, cfg)
        cls_logits, box_deltas = self.box_head(rois)
        out["class_logits"] = cls_logits

        # detection assembly (single image)
        probs = jax.nn.softmax(cls_logits, axis=-1)
        best_cls = jnp.argmax(probs[:, 1:], axis=-1) + 1
        best_score = jnp.take_along_axis(
            probs, best_cls[:, None], axis=1)[:, 0]
        best_score = jnp.where(prop_valid, best_score, 0.0)
        det_deltas = jnp.take_along_axis(
            box_deltas, best_cls[:, None, None].repeat(4, -1), axis=1)[:, 0]
        det_boxes = jnp.clip(apply_deltas(
            props, det_deltas * jnp.asarray(cfg.bbox_std, jnp.float32)),
            0.0, 1.0)
        sel, valid = nms_fixed(det_boxes, best_score, cfg.max_detections,
                               cfg.detection_nms_threshold)
        final_boxes = det_boxes[sel]
        final_scores = best_score[sel]
        final_cls = best_cls[sel]
        valid = valid & (final_scores >= cfg.score_threshold)

        out["detections"] = jnp.where(valid[:, None], final_boxes, 0.0)
        out["detection_scores"] = jnp.where(valid, final_scores, 0.0)
        out["detection_classes"] = jnp.where(valid, final_cls, 0)
        out["detection_valid"] = valid

        mask_rois = roi_align(feats, final_boxes, cfg.mask_pool_size, cfg)
        mask_logits = self.mask_head(mask_rois)       # (D, 28, 28, C)
        det_masks = jnp.take_along_axis(
            mask_logits,
            final_cls[:, None, None, None].astype(jnp.int32), axis=-1,
        )[..., 0]
        out["mask_logits"] = det_masks
        return out

    def train_losses(self, image, gt_boxes, gt_classes, gt_valid, gt_masks,
                     rng):
        """End-to-end training losses for one image: RPN class/box + box-head
        class/box + mask head, with proposal-target sampling between the RPN
        and the heads (the reference network is trained exactly this way in
        matterport's train(); MaskRCNN.py.in consumes those weights).

        gt_masks: (G, Hm, Wm) float binary instance masks (full image)."""
        cfg = self.cfg
        x = self._normalise(image)
        feats = self.backbone(x, True)
        rpn_logits, rpn_deltas = self.rpn(feats)
        l_rpn = rpn_loss(rpn_logits[0], rpn_deltas[0], self.anchors,
                         gt_boxes, gt_valid, cfg)

        props, prop_valid = self._proposals(rpn_logits[0], rpn_deltas[0])
        props = jax.lax.stop_gradient(props)
        # augment the training pool with the gt boxes themselves so positive
        # rois exist from step 0 (else the heads only ever see background
        # until the RPN converges — the standard detectron trick)
        props = jnp.concatenate([props, gt_boxes.astype(props.dtype)])
        prop_valid = jnp.concatenate([prop_valid, gt_valid])
        tgt = proposal_targets(rng, props, prop_valid, gt_boxes, gt_classes,
                               gt_valid, gt_masks, cfg)

        rois = roi_align(feats, tgt.rois, cfg.roi_pool_size, cfg)
        cls_logits, box_deltas = self.box_head(rois)
        l_cls, l_box = box_head_loss(cls_logits, box_deltas, tgt)

        mask_rois = roi_align(feats, tgt.rois, cfg.mask_pool_size, cfg)
        mask_logits = self.mask_head(mask_rois)
        l_mask = mask_head_loss(mask_logits, tgt)

        return {
            "rpn": l_rpn, "class": l_cls, "box": l_box, "mask": l_mask,
            "total": l_rpn + l_cls + l_box + l_mask,
        }


# --------------------------------------------------------------------------
# Training losses (RPN + heads) — the fine-tuning path
# --------------------------------------------------------------------------

def rpn_targets(anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                gt_valid: jnp.ndarray, cfg: MaskRCNNConfig):
    """Per-anchor class target (1 pos / 0 neg / -1 ignore) + box deltas."""
    iou = box_iou(anchors, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, 0.0)
    best_iou = jnp.max(iou, axis=1)
    best_gt = jnp.argmax(iou, axis=1)
    labels = jnp.full(anchors.shape[0], -1, jnp.int32)
    labels = jnp.where(best_iou < cfg.rpn_negative_iou, 0, labels)
    labels = jnp.where(best_iou >= cfg.rpn_positive_iou, 1, labels)
    # guarantee positives: anchor with max IoU per gt
    best_anchor = jnp.argmax(iou, axis=0)
    labels = labels.at[best_anchor].set(jnp.where(gt_valid, 1, labels[best_anchor]))

    gt = gt_boxes[best_gt]
    ah = jnp.clip(anchors[:, 2] - anchors[:, 0], 1e-6)
    aw = jnp.clip(anchors[:, 3] - anchors[:, 1], 1e-6)
    gh = jnp.clip(gt[:, 2] - gt[:, 0], 1e-6)
    gw = jnp.clip(gt[:, 3] - gt[:, 1], 1e-6)
    deltas = jnp.stack([
        ((gt[:, 0] + gh / 2) - (anchors[:, 0] + ah / 2)) / ah,
        ((gt[:, 1] + gw / 2) - (anchors[:, 1] + aw / 2)) / aw,
        jnp.log(gh / ah), jnp.log(gw / aw),
    ], -1) / jnp.asarray(cfg.bbox_std, jnp.float32)
    return labels, deltas


def rpn_loss(rpn_logits, rpn_deltas, anchors, gt_boxes, gt_valid,
             cfg: MaskRCNNConfig):
    labels, target_deltas = rpn_targets(anchors, gt_boxes, gt_valid, cfg)
    use = labels >= 0
    ce = -jax.nn.log_softmax(rpn_logits)[
        jnp.arange(labels.shape[0]), jnp.clip(labels, 0)]
    cls_loss = jnp.sum(jnp.where(use, ce, 0.0)) / jnp.maximum(jnp.sum(use), 1)
    pos = labels == 1
    l1 = jnp.sum(jnp.abs(rpn_deltas - target_deltas), -1)
    box_loss = jnp.sum(jnp.where(pos, l1, 0.0)) / jnp.maximum(jnp.sum(pos), 1)
    return cls_loss + box_loss


# --------------------------------------------------------------------------
# Head training: proposal-target sampling + box/mask losses
# (matterport DetectionTargetLayer semantics, MaskRCNN.py.in model config)
# --------------------------------------------------------------------------

def box_deltas_between(src: jnp.ndarray, dst: jnp.ndarray,
                       cfg: MaskRCNNConfig) -> jnp.ndarray:
    """(dy, dx, log dh, log dw) refinement targets src -> dst, normalised by
    BBOX_STD_DEV."""
    sh = jnp.clip(src[:, 2] - src[:, 0], 1e-6)
    sw = jnp.clip(src[:, 3] - src[:, 1], 1e-6)
    dh = jnp.clip(dst[:, 2] - dst[:, 0], 1e-6)
    dw = jnp.clip(dst[:, 3] - dst[:, 1], 1e-6)
    return jnp.stack([
        ((dst[:, 0] + dh / 2) - (src[:, 0] + sh / 2)) / sh,
        ((dst[:, 1] + dw / 2) - (src[:, 1] + sw / 2)) / sw,
        jnp.log(dh / sh), jnp.log(dw / sw),
    ], -1) / jnp.asarray(cfg.bbox_std, jnp.float32)


def crop_masks_to_boxes(gt_masks: jnp.ndarray, boxes: jnp.ndarray,
                        out_size: int) -> jnp.ndarray:
    """Bilinearly resample each instance mask (N, H, W) to its box's
    out_size^2 grid — the mask-head target crop (matterport
    DetectionTargetLayer's tf.image.crop_and_resize)."""
    N, H, W = gt_masks.shape
    ys = jnp.linspace(0.0, 1.0, out_size)
    xs = jnp.linspace(0.0, 1.0, out_size)
    h = boxes[:, 2] - boxes[:, 0]
    w = boxes[:, 3] - boxes[:, 1]
    gy = (boxes[:, 0:1] + ys[None, :] * h[:, None]) * H - 0.5   # (N, S)
    gx = (boxes[:, 1:2] + xs[None, :] * w[:, None]) * W - 0.5
    y0 = jnp.floor(gy).astype(jnp.int32)
    x0 = jnp.floor(gx).astype(jnp.int32)
    wy = (gy - y0)[:, :, None]
    wx = (gx - x0)[:, None, :]

    def g(yi, xi):
        yi = jnp.clip(yi, 0, H - 1)
        xi = jnp.clip(xi, 0, W - 1)
        idx = yi[:, :, None] * W + xi[:, None, :]           # (N, S, S)
        flat = gt_masks.reshape(N, H * W)
        return jnp.take_along_axis(flat, idx.reshape(N, -1),
                                   axis=1).reshape(N, out_size, out_size)

    v00 = g(y0, x0)
    v01 = g(y0, x0 + 1)
    v10 = g(y0 + 1, x0)
    v11 = g(y0 + 1, x0 + 1)
    return (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
            + v10 * wy * (1 - wx) + v11 * wy * wx)


class ProposalTargets(NamedTuple):
    rois: jnp.ndarray           # (T, 4) sampled training rois
    target_class: jnp.ndarray   # (T,) int32, 0 = background
    target_deltas: jnp.ndarray  # (T, 4) for the target class
    target_masks: jnp.ndarray   # (T, 2*mask_pool, 2*mask_pool) in [0,1]
    positive: jnp.ndarray       # (T,) bool
    valid: jnp.ndarray          # (T,) bool (positive or sampled negative)


def proposal_targets(rng, proposals: jnp.ndarray, prop_valid: jnp.ndarray,
                     gt_boxes: jnp.ndarray, gt_classes: jnp.ndarray,
                     gt_valid: jnp.ndarray, gt_masks: jnp.ndarray,
                     cfg: MaskRCNNConfig) -> ProposalTargets:
    """Sample train_rois proposals into positives (IoU >= 0.5, matterport
    ratio 0.33) and negatives, with class/box/mask targets — a static-shape
    DetectionTargetLayer."""
    T = cfg.train_rois
    n_pos = int(round(T * cfg.roi_positive_ratio))

    iou = box_iou(proposals, gt_boxes)
    iou = jnp.where(gt_valid[None, :] & prop_valid[:, None], iou, 0.0)
    best_iou = jnp.max(iou, axis=1)
    best_gt = jnp.argmax(iou, axis=1)

    is_pos = prop_valid & (best_iou >= cfg.roi_positive_iou)
    is_neg = prop_valid & (best_iou < cfg.roi_positive_iou)

    r_pos, r_neg = jax.random.uniform(rng, (2, proposals.shape[0]))
    pos_score = jnp.where(is_pos, r_pos, -1.0)
    _, pos_idx = jax.lax.top_k(pos_score, n_pos)
    pos_ok = pos_score[pos_idx] >= 0.0
    neg_score = jnp.where(is_neg, r_neg, -1.0)
    _, neg_idx = jax.lax.top_k(neg_score, T - n_pos)
    neg_ok = neg_score[neg_idx] >= 0.0

    sel = jnp.concatenate([pos_idx, neg_idx])
    positive = jnp.concatenate([pos_ok, jnp.zeros(T - n_pos, bool)])
    valid = jnp.concatenate([pos_ok, neg_ok])

    rois = proposals[sel]
    gt_idx = best_gt[sel]
    tgt_cls = jnp.where(positive, gt_classes[gt_idx], 0).astype(jnp.int32)
    tgt_deltas = box_deltas_between(rois, gt_boxes[gt_idx], cfg)
    tgt_masks = crop_masks_to_boxes(gt_masks[gt_idx], rois,
                                    cfg.mask_pool_size * 2)
    return ProposalTargets(rois, tgt_cls, tgt_deltas, tgt_masks,
                           positive, valid)


def box_head_loss(cls_logits, box_deltas, tgt: ProposalTargets):
    """Class CE over sampled rois + smooth-L1 on positives' target class
    (mrcnn_class_loss + mrcnn_bbox_loss)."""
    T = cls_logits.shape[0]
    ce = -jax.nn.log_softmax(cls_logits)[jnp.arange(T), tgt.target_class]
    cls_loss = (jnp.sum(jnp.where(tgt.valid, ce, 0.0))
                / jnp.maximum(jnp.sum(tgt.valid), 1))
    sel = jnp.take_along_axis(
        box_deltas, tgt.target_class[:, None, None].repeat(4, -1), axis=1
    )[:, 0]
    diff = jnp.abs(sel - tgt.target_deltas)
    sl1 = jnp.sum(jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5), -1)
    box_loss = (jnp.sum(jnp.where(tgt.positive, sl1, 0.0))
                / jnp.maximum(jnp.sum(tgt.positive), 1))
    return cls_loss, box_loss


def mask_head_loss(mask_logits, tgt: ProposalTargets):
    """Per-pixel binary CE at the target class channel (mrcnn_mask_loss)."""
    T = mask_logits.shape[0]
    sel = jnp.take_along_axis(
        mask_logits, tgt.target_class[:, None, None, None], axis=-1)[..., 0]
    y = tgt.target_masks
    bce = jnp.maximum(sel, 0) - sel * y + jnp.log1p(jnp.exp(-jnp.abs(sel)))
    per_roi = jnp.mean(bce, axis=(1, 2))
    return (jnp.sum(jnp.where(tgt.positive, per_roi, 0.0))
            / jnp.maximum(jnp.sum(tgt.positive), 1))
