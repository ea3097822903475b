"""Live-capture readers.

Equivalents of the reference's camera sources (GUI/Tools/OpenNI2LiveReader,
FreenectLiveReader, RealsenseLiveReader, PangolinReader).  This environment
has no RGB-D hardware or vendor SDKs; each reader keeps the reference's
interface and degrades with a clear DeviceNotAvailable error when its
backend is missing.  `VideoLogReader` (cv2.VideoCapture over files, streams
or V4L devices) is the working generic source, covering the PangolinReader
video-URI role."""

from __future__ import annotations

import importlib
import threading
import time
from collections import deque
from typing import Optional

import numpy as np

from maskfusion_tpu.frame import FrameData
from maskfusion_tpu.io.log_reader import LogReader


class DeviceNotAvailable(RuntimeError):
    pass


class RingBuffer:
    """Thread-safe latest-N frame buffer (ref ThreadMutexObject ring,
    OpenNI2Interface's 10-slot buffer)."""

    def __init__(self, size: int = 10):
        self._dq = deque(maxlen=size)
        self._lock = threading.Lock()
        self._count = 0

    def push(self, frame: FrameData):
        with self._lock:
            self._count += 1
            frame.index = self._count - 1
            self._dq.append(frame)

    def latest(self) -> Optional[FrameData]:
        with self._lock:
            return self._dq[-1] if self._dq else None


class VideoLogReader(LogReader):
    """RGB video source (no depth) via OpenCV — usable for RGB-only /
    frame-to-frame tracking modes and testing capture plumbing."""

    def __init__(self, uri, flip_colors: bool = False,
                 synthetic_depth: Optional[float] = None):
        super().__init__(str(uri), flip_colors)
        import cv2

        self.cap = cv2.VideoCapture(uri)
        if not self.cap.isOpened():
            raise DeviceNotAvailable(f"cannot open video source {uri!r}")
        self.synthetic_depth = synthetic_depth
        self._frame_idx = 0

    def get_next(self) -> Optional[FrameData]:
        import cv2

        ok, bgr = self.cap.read()
        if not ok:
            return None
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        if self.flip_colors:
            rgb = rgb[..., ::-1].copy()
        depth = np.full(rgb.shape[:2],
                        self.synthetic_depth or 0.0, np.float32)
        f = FrameData(rgb=rgb, depth=depth, index=self._frame_idx,
                      timestamp=self._frame_idx * 1000.0 / 30.0)
        self._frame_idx += 1
        self.current_frame = self._frame_idx
        return f

    def has_more(self) -> bool:
        return self.cap.isOpened()


class _SdkLiveReader(LogReader):
    """Base for vendor-SDK readers: probes for the python binding, raises
    DeviceNotAvailable otherwise (keeps the reference's optional-build
    semantics, GUI/CMakeLists WITH_FREENECT2 etc.)."""

    SDK_MODULE = ""
    NAME = ""

    def __init__(self, flip_colors: bool = False):
        super().__init__(self.NAME, flip_colors)
        try:
            self.sdk = importlib.import_module(self.SDK_MODULE)
        except ImportError as e:
            raise DeviceNotAvailable(
                f"{self.NAME} requires the {self.SDK_MODULE!r} binding, "
                f"which is not installed in this environment") from e
        self.ring = RingBuffer()

    def has_more(self) -> bool:
        return True

    def get_next(self) -> Optional[FrameData]:
        deadline = time.monotonic() + 5.0
        while time.monotonic() < deadline:
            f = self.ring.latest()
            if f is not None and f.index >= self.current_frame:
                self.current_frame = f.index + 1
                return f
            time.sleep(0.002)
        raise DeviceNotAvailable(f"{self.NAME}: no frames arriving")


class OpenNI2LiveReader(_SdkLiveReader):
    """Kinect v1 / Asus Xtion (ref OpenNI2LiveReader + OpenNI2Interface)."""
    SDK_MODULE = "openni"
    NAME = "OpenNI2"


class FreenectLiveReader(_SdkLiveReader):
    """Kinect v2 (ref FreenectLiveReader, optional WITH_FREENECT2 build)."""
    SDK_MODULE = "freenect2"
    NAME = "Freenect2"


class RealsenseLiveReader(_SdkLiveReader):
    """Intel RealSense (ref RealsenseLiveReader, optional build)."""
    SDK_MODULE = "pyrealsense2"
    NAME = "RealSense"
