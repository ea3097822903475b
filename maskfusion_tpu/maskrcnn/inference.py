"""Mask R-CNN inference wrapper + async worker.

Equivalents of:
  - MaskRCNN.py.in `execute(rgb)` + helpers.py `generate_id_image`
    (flatten instance masks to a uint8 id image + class-id/roi lists)
  - the C++ worker thread that labels the newest frame in the engine's
    delay queue (MaskRCNN.cpp:178-208) and the sequential fallback
    (:147-151)
  - config.toml class_names / filter_classes / score_threshold surface
    (config.toml.in:4-36)
"""

from __future__ import annotations

import queue
import threading
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from maskfusion_tpu.frame import FrameData
from maskfusion_tpu.maskrcnn.model import MaskRCNN, MaskRCNNConfig

# COCO class list (matterport ordering; config.toml.in class_names)
COCO_CLASS_NAMES = [
    "BG", "person", "bicycle", "car", "motorcycle", "airplane", "bus",
    "train", "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella", "handbag",
    "tie", "suitcase", "frisbee", "skis", "snowboard", "sports ball", "kite",
    "baseball bat", "baseball glove", "skateboard", "surfboard",
    "tennis racket", "bottle", "wine glass", "cup", "fork", "knife", "spoon",
    "bowl", "banana", "apple", "sandwich", "orange", "broccoli", "carrot",
    "hot dog", "pizza", "donut", "cake", "chair", "couch", "potted plant",
    "bed", "dining table", "toilet", "tv", "laptop", "mouse", "remote",
    "keyboard", "cell phone", "microwave", "oven", "toaster", "sink",
    "refrigerator", "book", "clock", "vase", "scissors", "teddy bear",
    "hair drier", "toothbrush",
]


def generate_id_image(
    boxes: np.ndarray,          # (D, 4) normalised y1x1y2x2
    masks: np.ndarray,          # (D, S, S) logits
    classes: np.ndarray,        # (D,)
    scores: np.ndarray,
    valid: np.ndarray,
    height: int,
    width: int,
    score_threshold: float = 0.55,
    filter_classes: Optional[Sequence[int]] = None,
) -> Tuple[np.ndarray, List[int], List[Tuple[int, int, int, int]]]:
    """Paste per-detection masks into a uint8 instance-id image (1..n) with
    class ids and ROIs — helpers.py:70-98 equivalent.  Later (higher-score)
    instances do not overwrite earlier ones, matching the reference's paste
    order."""
    id_image = np.zeros((height, width), np.uint8)
    class_ids: List[int] = [0]
    rois: List[Tuple[int, int, int, int]] = []
    next_id = 1
    order = np.argsort(-scores)
    for i in order:
        if not valid[i] or scores[i] < score_threshold:
            continue
        if filter_classes and int(classes[i]) not in filter_classes:
            continue
        if next_id >= 255:
            break
        y1 = int(np.clip(boxes[i, 0] * height, 0, height - 1))
        x1 = int(np.clip(boxes[i, 1] * width, 0, width - 1))
        y2 = int(np.clip(boxes[i, 2] * height, y1 + 1, height))
        x2 = int(np.clip(boxes[i, 3] * width, x1 + 1, width))
        import cv2

        m = cv2.resize(masks[i].astype(np.float32), (x2 - x1, y2 - y1))
        region = id_image[y1:y2, x1:x2]
        paint = (m > 0) & (region == 0)
        region[paint] = next_id
        class_ids.append(int(classes[i]))
        rois.append((y1, x1, y2, x2))
        next_id += 1
    return id_image, class_ids, rois


class MaskRCNNInference:
    """Jitted single-image inference with the reference's config surface."""

    def __init__(self, cfg: Optional[MaskRCNNConfig] = None,
                 params=None, seed: int = 0,
                 filter_classes: Optional[Sequence[int]] = None):
        self.cfg = cfg or MaskRCNNConfig()
        self.model = MaskRCNN(self.cfg)
        self.filter_classes = list(filter_classes) if filter_classes else None
        if params is None:
            dummy = jnp.zeros((1, self.cfg.image_size, self.cfg.image_size, 3))
            params = self.model.init(jax.random.PRNGKey(seed), dummy)
        self.params = params
        self._apply = jax.jit(self.model.apply)

    def execute(self, frame: FrameData) -> FrameData:
        """Label a frame in place (MaskRCNN::executeSequential)."""
        import cv2

        S = self.cfg.image_size
        img = cv2.resize(frame.rgb, (S, S)).astype(np.float32)[None]
        out = self._apply(self.params, jnp.asarray(img))
        id_img, class_ids, rois = generate_id_image(
            np.asarray(out["detections"]),
            np.asarray(out["mask_logits"]),
            np.asarray(out["detection_classes"]),
            np.asarray(out["detection_scores"]),
            np.asarray(out["detection_valid"]),
            frame.height, frame.width,
            self.cfg.score_threshold, self.filter_classes,
        )
        frame.mask = id_img
        frame.class_ids = class_ids
        frame.rois = rois
        return frame


class MaskRCNNWorker:
    """Async labelling thread over the engine's frame delay-queue.

    Mirrors MaskRCNN::startThreadLoop/loop (MaskRCNN.cpp:178-208): repeatedly
    labels the newest unlabelled frame in the queue; the engine only consumes
    frames once their masks arrived (or the queue overflows)."""

    def __init__(self, inference: MaskRCNNInference, frame_queue):
        self.inference = inference
        self.queue = frame_queue
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def _loop(self):
        while not self._stop.is_set():
            frame = self.queue.newest_unlabelled()
            if frame is None:
                self._stop.wait(0.002)
                continue
            self.inference.execute(frame)

    def stop(self):
        self._stop.set()
        self.thread.join(timeout=5)


class FrameQueue:
    """Delay queue between reader and engine (MaskFusion.h:362-363,
    MaskFusion.cpp:206-209): frames wait up to `size` slots for the async
    labeller before the engine consumes them."""

    def __init__(self, size: int = 30):
        self.size = size
        self._lock = threading.Lock()
        self._frames: List[FrameData] = []

    def push(self, frame: FrameData):
        with self._lock:
            self._frames.append(frame)

    def pop_ready(self, flush: bool = False) -> Optional[FrameData]:
        """Oldest frame, but only once labelled or the queue is full.

        ``flush=True`` (end of stream) pops the head regardless: with no
        more pushes arriving the queue can never reach `size`, and the
        worker labels newest-first, so an unlabelled head would otherwise
        wait forever — it exits unlabelled exactly as an overflowing queue
        would have dropped it (MaskFusion.cpp:206-209 lag semantics)."""
        with self._lock:
            if not self._frames:
                return None
            head = self._frames[0]
            if (head.mask is not None or len(self._frames) >= self.size
                    or flush):
                return self._frames.pop(0)
            return None

    def newest_unlabelled(self) -> Optional[FrameData]:
        with self._lock:
            for f in reversed(self._frames):
                if f.mask is None:
                    return f
        return None

    def __len__(self):
        with self._lock:
            return len(self._frames)


def load_toml_config(path: str):
    """config.toml surface: class_names, filter_classes, score_threshold,
    trackable_classes (config.toml.in + MainController.cpp:269-287)."""
    import tomllib

    with open(path, "rb") as f:
        data = tomllib.load(f)
    mr = data.get("MaskRCNN", data)
    return {
        "class_names": mr.get("class_names", COCO_CLASS_NAMES),
        "filter_classes": mr.get("filter_classes", []),
        "score_threshold": mr.get("score_threshold", 0.55),
        "trackable_classes": data.get("ModelSpawning", {}).get(
            "trackable_classes", []),
    }
