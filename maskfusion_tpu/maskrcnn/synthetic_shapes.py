"""Synthetic shapes dataset for Mask R-CNN training demonstrations.

No pretrained weights ship in this environment, so trainability and
detection quality are demonstrated on a generated domain (bright geometric
shapes on dark noise), mirroring how matterport's own tutorial validates the
training path (Mask_RCNN train_shapes.ipynb).  Class ids: 1 = rectangle,
2 = disk; 0 = background.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


NUM_SHAPE_CLASSES = 3   # bg, rectangle, disk


def make_shapes_scene(
    rng: np.random.Generator,
    size: int,
    max_objects: int = 2,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """One scene.  Returns (image (S,S,3) f32 0..255, boxes (M,4) normalised
    [y1,x1,y2,x2], classes (M,) i32, valid (M,) bool, masks (M,S,S) f32)."""
    S = size
    img = rng.uniform(0.0, 50.0, (S, S, 3)).astype(np.float32)
    n = int(rng.integers(1, max_objects + 1))
    boxes = np.zeros((max_objects, 4), np.float32)
    classes = np.zeros((max_objects,), np.int32)
    valid = np.zeros((max_objects,), bool)
    masks = np.zeros((max_objects, S, S), np.float32)

    yy, xx = np.mgrid[0:S, 0:S]
    for i in range(n):
        cls = int(rng.integers(1, NUM_SHAPE_CLASSES))
        h = rng.uniform(0.25, 0.5) * S
        w = rng.uniform(0.25, 0.5) * S
        cy = rng.uniform(h / 2 + 1, S - h / 2 - 1)
        cx = rng.uniform(w / 2 + 1, S - w / 2 - 1)
        if cls == 1:
            m = ((np.abs(yy - cy) <= h / 2) & (np.abs(xx - cx) <= w / 2))
        else:
            r = min(h, w) / 2
            m = ((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r
            h = w = 2 * r
        color = np.zeros(3, np.float32)
        color[cls - 1] = rng.uniform(180, 255)          # channel encodes class
        color[2] = rng.uniform(120, 200)
        img[m] = color + rng.uniform(-10, 10, 3).astype(np.float32)
        masks[i][m] = 1.0
        boxes[i] = [max(cy - h / 2, 0) / S, max(cx - w / 2, 0) / S,
                    min(cy + h / 2, S) / S, min(cx + w / 2, S) / S]
        classes[i] = cls
        valid[i] = True
    return img, boxes, classes, valid, masks


def make_batch(rng: np.random.Generator, batch: int, size: int,
               max_objects: int = 2):
    """Stacked batch of scenes (for the sharded train step)."""
    outs = [make_shapes_scene(rng, size, max_objects) for _ in range(batch)]
    return tuple(np.stack([o[k] for o in outs]) for k in range(5))


def box_iou_np(a: np.ndarray, b: np.ndarray) -> float:
    y1 = max(a[0], b[0]); x1 = max(a[1], b[1])
    y2 = min(a[2], b[2]); x2 = min(a[3], b[3])
    inter = max(y2 - y1, 0.0) * max(x2 - x1, 0.0)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return float(inter / max(ua, 1e-10))
