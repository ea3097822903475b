"""Native C++ label ops must agree with the python reference paths."""

import numpy as np
import pytest

from maskfusion_tpu import cpp as native
from maskfusion_tpu.segmentation import components as cc


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("libmfcore not built")
    return lib


def _python_cc(binary):
    from scipy import ndimage
    labels, n = ndimage.label(binary, structure=cc._FOUR_CONN)
    return labels.astype(np.int32), n


def test_cc_matches_scipy(lib):
    rng = np.random.default_rng(0)
    binary = rng.random((120, 160)) > 0.55
    out = cc.connected_components(binary)
    ref_labels, ref_n = _python_cc(binary)
    assert out.count == ref_n + 1
    np.testing.assert_array_equal(out.labels, ref_labels)
    ref_sizes = np.bincount(ref_labels.ravel(), minlength=ref_n + 1)
    np.testing.assert_array_equal(out.sizes, ref_sizes)


def test_cc_bboxes(lib):
    binary = np.zeros((20, 30), bool)
    binary[3:7, 5:11] = True
    binary[12:15, 20:25] = True
    out = cc.connected_components(binary)
    assert out.count == 3
    np.testing.assert_array_equal(out.bboxes[1], [3, 5, 6, 10])
    np.testing.assert_array_equal(out.bboxes[2], [12, 20, 14, 24])


def test_reassign_native_matches_python(lib):
    rng = np.random.default_rng(1)
    binary = rng.random((60, 80)) > 0.4
    depth = np.full((60, 80), 1.0, np.float32)
    comp = cc.connected_components(binary)
    out_native = cc.reassign_edge_pixels(comp, depth, iterations=3)

    # force the python path
    import maskfusion_tpu.cpp as m
    saved = m._lib, m._tried
    m._lib, m._tried = None, True
    try:
        out_py = cc.reassign_edge_pixels(comp, depth, iterations=3)
    finally:
        m._lib, m._tried = saved
    mismatch = (out_native != out_py).mean()
    assert mismatch < 0.02, f"native/python reassign disagree {mismatch:.3f}"


def test_inflate_roundtrip(lib):
    import ctypes
    import zlib

    rng = np.random.default_rng(2)
    raw = rng.integers(0, 5000, 320 * 240).astype(np.uint16).tobytes()
    comp = zlib.compress(raw)
    src = (ctypes.c_uint8 * len(comp)).from_buffer_copy(comp)
    dst = (ctypes.c_uint8 * len(raw))()
    n = lib.mf_inflate(src, len(comp), dst, len(raw))
    assert n == len(raw)
    assert bytes(dst) == raw


def test_native_cc_beats_scipy_on_vga():
    """The run-based union-find (cpp/mfcore) must actually earn its keep
    against the scipy fallback on a realistic VGA non-edge mask
    (ConnectedLabels.hpp:23-32 is the reference's CPU hot path)."""
    import time

    import numpy as np
    from scipy import ndimage

    from maskfusion_tpu import cpp as native

    lib = native.load()
    if lib is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    x, y = np.meshgrid(np.arange(640), np.arange(480))
    binary = ~(((np.sin(x * 0.05) + np.cos(y * 0.07)) > 1.2)
               | (rng.random((480, 640)) < 0.02))
    b = np.ascontiguousarray(binary.astype(np.uint8))
    labels = np.empty((480, 640), np.int32)
    sizes = np.empty(65536, np.int32)
    bb = np.empty((65536, 4), np.int32)

    def run_native():
        return lib.mf_connected_components(
            b, 480, 640, labels.reshape(-1), sizes, bb.reshape(-1), 65536)

    F = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool)

    def run_scipy():
        lab2, n2 = ndimage.label(binary, structure=F)
        np.bincount(lab2.ravel())
        ndimage.find_objects(lab2)
        return lab2, n2

    run_native(); run_scipy()                    # warm
    t0 = time.perf_counter()
    for _ in range(10):
        n = run_native()
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10):
        lab2, n2 = run_scipy()
    t_sci = time.perf_counter() - t0
    assert n == n2 + 1
    # same partition (bijective label mapping)
    pair = labels.astype(np.int64) * (n2 + 2) + lab2
    assert len(np.unique(pair)) == n
    assert t_nat < t_sci, (t_nat, t_sci)
