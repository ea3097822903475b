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
from typing import Any, Dict, Optional, Sequence, Tuple

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
    # train
    rpn_positive_iou: float = 0.7
    rpn_negative_iou: float = 0.3
    dtype: Any = jnp.bfloat16


# --------------------------------------------------------------------------
# Backbone: ResNet-50
# --------------------------------------------------------------------------

class Bottleneck(nn.Module):
    filters: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.filters, (1, 1), dtype=self.dtype, use_bias=False)(x)
        y = nn.GroupNorm(num_groups=32, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    dtype=self.dtype, use_bias=False)(y)
        y = nn.GroupNorm(num_groups=32, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), dtype=self.dtype,
                    use_bias=False)(y)
        y = nn.GroupNorm(num_groups=32, dtype=self.dtype)(y)
        if residual.shape[-1] != self.filters * 4 or self.stride != 1:
            residual = nn.Conv(self.filters * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               dtype=self.dtype, use_bias=False)(residual)
            residual = nn.GroupNorm(num_groups=32, dtype=self.dtype)(residual)
        return nn.relu(y + residual)


class ResNetFPN(nn.Module):
    """ResNet-50 + FPN producing P2..P6 at strides 4..64."""
    cfg: MaskRCNNConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.cfg.dtype
        x = x.astype(dt)
        x = nn.Conv(64, (7, 7), strides=(2, 2), dtype=dt, use_bias=False)(x)
        x = nn.GroupNorm(num_groups=32, dtype=dt)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        def stage(x, filters, blocks, stride):
            x = Bottleneck(filters, stride, dt)(x, train)
            for _ in range(blocks - 1):
                x = Bottleneck(filters, 1, dt)(x, train)
            return x

        c2 = stage(x, 64, 3, 1)     # stride 4
        c3 = stage(c2, 128, 4, 2)   # stride 8
        c4 = stage(c3, 256, 6, 2)   # stride 16
        c5 = stage(c4, 512, 3, 2)   # stride 32

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
    cfg: MaskRCNNConfig

    @nn.compact
    def __call__(self, rois):
        dt = self.cfg.dtype
        x = rois.reshape(rois.shape[0], -1).astype(dt)
        x = nn.relu(nn.Dense(1024, dtype=dt)(x))
        x = nn.relu(nn.Dense(1024, dtype=dt)(x))
        logits = nn.Dense(self.cfg.num_classes, dtype=dt)(x)
        deltas = nn.Dense(self.cfg.num_classes * 4, dtype=dt)(x)
        return (logits.astype(jnp.float32),
                deltas.reshape(-1, self.cfg.num_classes, 4).astype(jnp.float32))


class MaskHead(nn.Module):
    cfg: MaskRCNNConfig

    @nn.compact
    def __call__(self, rois):
        dt = self.cfg.dtype
        x = rois.astype(dt)
        for _ in range(4):
            x = nn.relu(nn.Conv(256, (3, 3), dtype=dt)(x))
        x = nn.relu(nn.ConvTranspose(256, (2, 2), strides=(2, 2), dtype=dt)(x))
        x = nn.Conv(self.cfg.num_classes, (1, 1), dtype=dt)(x)
        return x.astype(jnp.float32)


class MaskRCNN(nn.Module):
    cfg: MaskRCNNConfig

    def setup(self):
        self.backbone = ResNetFPN(self.cfg)
        self.rpn = RPNHead(self.cfg)
        self.box_head = BoxHead(self.cfg)
        self.mask_head = MaskHead(self.cfg)
        self.anchors = jnp.asarray(generate_anchors(self.cfg))

    def _proposals(self, rpn_logits, rpn_deltas):
        """RPN scores + deltas -> post_nms_proposals boxes (single image)."""
        cfg = self.cfg
        scores = jax.nn.softmax(rpn_logits, axis=-1)[:, 1]
        k = min(cfg.pre_nms_limit, scores.shape[0])
        top_scores, top_idx = jax.lax.top_k(scores, k)
        boxes = apply_deltas(self.anchors[top_idx],
                             rpn_deltas[top_idx] * 0.1)
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
        x = (image - 127.5) / 127.5
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
        det_boxes = jnp.clip(apply_deltas(props, det_deltas * 0.1), 0.0, 1.0)
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
    ], -1) / 0.1
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
