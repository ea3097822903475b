"""Frame containers.

Equivalent of Core/FrameData.h:25-48: per-frame rgb (H,W,3 uint8), metric
depth (H,W float32, metres), optional instance mask (H,W uint8 label image)
with per-instance class ids and bounding boxes.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class FrameData:
    rgb: np.ndarray                      # (H, W, 3) uint8, RGB order
    depth: np.ndarray                    # (H, W) float32, metres (0 = invalid)
    timestamp: float = 0.0
    index: int = -1
    mask: Optional[np.ndarray] = None    # (H, W) uint8 instance-id image
    class_ids: Optional[List[int]] = None
    rois: Optional[List[Tuple[int, int, int, int]]] = None  # (y0,x0,y1,x1)

    @property
    def height(self) -> int:
        return int(self.rgb.shape[0])

    @property
    def width(self) -> int:
        return int(self.rgb.shape[1])

    def flip_colors(self) -> "FrameData":
        """-f flag: swap RGB/BGR (FrameData.h:40-46)."""
        return dataclasses.replace(self, rgb=self.rgb[..., ::-1].copy())
