"""Live-capture loop against a fake vendor SDK.

The generic callback->ring-buffer->FrameData machinery of _SdkLiveReader
mirrors OpenNI2Interface.cpp:1-222; with no RGB-D hardware in this
environment, a fake `openni` module injected into sys.modules drives the
REAL OpenNI2 adapter + capture thread: frames arrive, ordering holds, the
loop survives transient SDK errors, stop() shuts down, and a stalled
stream times out."""

import sys
import threading
import time
import types

import numpy as np
import pytest


class _FakeFrame:
    def __init__(self, idx, h=48, w=64):
        self.height = h
        self.width = w
        self.timestamp = idx * 33333  # us, like OpenNI
        self._idx = idx
        self._h, self._w = h, w

    def get_buffer_as_uint16(self):
        d = np.full((self._h, self._w), 1000 + self._idx, np.uint16)
        return d.tobytes()

    def get_buffer_as_uint8(self):
        c = np.full((self._h, self._w, 3), self._idx % 256, np.uint8)
        return c.tobytes()


class _FakeStream:
    def __init__(self, ctl):
        self._ctl = ctl
        self.started = False

    def start(self):
        self.started = True

    def stop(self):
        self.started = False

    def read_frame(self):
        ctl = self._ctl
        with ctl["lock"]:
            if ctl.get("stall"):
                return None
            if ctl.get("raise_once"):
                ctl["raise_once"] = False
                raise RuntimeError("transient SDK error")
            idx = ctl["idx"]
            ctl["idx"] = idx + 1
        time.sleep(0.001)  # ~real frame pacing
        return _FakeFrame(idx)


class _FakeDevice:
    _ctl = None

    def __init__(self, ctl):
        self._ctl = ctl

    def create_depth_stream(self):
        return _FakeStream(self._ctl)

    def create_color_stream(self):
        return _FakeStream(self._ctl)

    def set_image_registration_mode(self, mode):
        self._ctl["registration"] = mode


def _install_fake_openni(monkeypatch, ctl):
    openni2 = types.SimpleNamespace()
    openni2.initialize = lambda: ctl.__setitem__("initialized", True)
    openni2.unload = lambda: ctl.__setitem__("unloaded", True)
    openni2.IMAGE_REGISTRATION_DEPTH_TO_COLOR = 7
    openni2.Device = types.SimpleNamespace(
        open_any=lambda: _FakeDevice(ctl))
    fake = types.ModuleType("openni")
    fake.openni2 = openni2
    monkeypatch.setitem(sys.modules, "openni", fake)
    return fake


def _make_ctl():
    return {"idx": 0, "lock": threading.Lock()}


def test_capture_loop_delivers_ordered_frames(monkeypatch):
    from maskfusion_tpu.io.live_readers import OpenNI2LiveReader

    ctl = _make_ctl()
    _install_fake_openni(monkeypatch, ctl)
    r = OpenNI2LiveReader()
    try:
        assert ctl.get("initialized")
        assert ctl.get("registration") == 7
        f1 = r.get_next()
        f2 = r.get_next()
        assert f1 is not None and f2 is not None
        assert f2.index > f1.index          # monotonic, newest-first ring
        assert f1.rgb.shape == (48, 64, 3)
        assert f1.depth.dtype == np.float32
        # depth converted mm -> m
        assert 0.9 < float(f1.depth[0, 0]) < 1.5
        assert r.has_more()
    finally:
        r.stop()
    assert not r.has_more()


def test_capture_survives_transient_errors(monkeypatch):
    from maskfusion_tpu.io.live_readers import OpenNI2LiveReader

    ctl = _make_ctl()
    ctl["raise_once"] = True
    _install_fake_openni(monkeypatch, ctl)
    r = OpenNI2LiveReader()
    try:
        f = r.get_next()
        assert f is not None
    finally:
        r.stop()


def test_capture_timeout_when_stalled(monkeypatch):
    from maskfusion_tpu.io.live_readers import (DeviceNotAvailable,
                                                OpenNI2LiveReader)

    ctl = _make_ctl()
    ctl["stall"] = True
    _install_fake_openni(monkeypatch, ctl)
    r = OpenNI2LiveReader(timeout=0.3)
    try:
        with pytest.raises(DeviceNotAvailable):
            r.get_next()
    finally:
        r.stop()


def test_missing_sdk_raises(monkeypatch):
    from maskfusion_tpu.io.live_readers import (DeviceNotAvailable,
                                                OpenNI2LiveReader)

    monkeypatch.setitem(sys.modules, "openni", None)
    monkeypatch.setattr("importlib.import_module",
                        lambda name: (_ for _ in ()).throw(ImportError(name)))
    with pytest.raises(DeviceNotAvailable):
        OpenNI2LiveReader()
