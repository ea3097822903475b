"""Pallas kernels (interpret mode on CPU) must match the jnp reference ops."""

import numpy as np
import jax.numpy as jnp

from maskfusion_tpu.ops import pallas_kernels as pk
from maskfusion_tpu.ops import preprocess as pp
from maskfusion_tpu.ops import seg_ops
from tests import synthetic as syn


def test_bilateral_pallas_matches_jnp():
    pts, cols = syn.make_scene()
    _, depth = syn.render(pts, cols, np.eye(4), syn.DEFAULT_INTR)
    depth[20:24, 30:40] = 0.0
    ref = np.asarray(pp.bilateral_filter_depth(jnp.asarray(depth), radius=6))
    out = np.asarray(pk.bilateral_filter_depth_pallas(
        jnp.asarray(depth), radius=6, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_edge_map_pallas_matches_jnp():
    pts, cols, labels = syn.make_scene_with_object()
    _, depth, _ = syn.render(pts, cols, np.eye(4), syn.DEFAULT_INTR,
                             labels=labels)
    vmap = pp.create_vmap(jnp.asarray(depth), syn.DEFAULT_INTR, 5.0)
    nmap = pp.create_nmap(vmap)
    ref = np.asarray(seg_ops.geometric_edge_map(vmap, nmap, 150.0, 2.8))
    out = np.asarray(pk.geometric_edge_map_pallas(
        vmap, nmap, 150.0, 2.8, interpret=True))
    # the concavity term is gated on sign(side); for neighbours with
    # side ~ 1e-9 the two summation orders can flip the gate — allow a
    # vanishing fraction of such knife-edge pixels
    mismatch = np.abs(out - ref) > 1e-5
    assert mismatch.mean() < 3e-3, f"{mismatch.sum()} mismatching pixels"


def test_predict_l0_scan_pallas_matches_jnp():
    """The Pallas level-0 winner scan must agree with the XLA tap loop on
    a real rendered index map (same winners up to ray-math reassociation
    ties; depth to 1e-5)."""
    import jax.numpy as jnp2
    from maskfusion_tpu.ops import splat
    from tests.test_mapping import _frame, _init_map, INTR, H, W

    f = _frame()
    m = _init_map(f)
    im = splat.render_index_map(
        m, jnp2.eye(4), INTR, H, W, time=1.0, time_delta=200, max_depth=5.0)

    ref = splat.combined_predict(im, INTR, max_depth=5.0)
    out = splat.combined_predict(im, INTR, max_depth=5.0,
                                 pallas=True, pallas_interpret=True)

    rd, od = np.asarray(ref.depth), np.asarray(out.depth)
    # winner ties can flip between the two summation orders on knife-edge
    # candidates; allow a vanishing fraction of differing pixels
    mismatch = np.abs(rd - od) > 1e-5
    assert mismatch.mean() < 3e-3, f"{mismatch.sum()} mismatching pixels"
    same = ~mismatch
    np.testing.assert_allclose(np.asarray(out.conf)[same],
                               np.asarray(ref.conf)[same], atol=1e-5)
    rn, on = np.asarray(ref.nmap), np.asarray(out.nmap)
    both = same & np.isfinite(rn[..., 0]) & np.isfinite(on[..., 0])
    np.testing.assert_allclose(on[both], rn[both], atol=1e-5)


def test_predict_l0_scan_pallas_with_coarse_and_window_intr():
    """Pallas scan composed with the coarse re-validation level, and with
    runtime-shifted (traced) principal points as the windowed object path
    passes them."""
    import jax
    import jax.numpy as jnp2
    from maskfusion_tpu.camera import CameraIntrinsics
    from maskfusion_tpu.ops import splat
    from tests.test_mapping import _frame, _init_map, INTR, H, W

    f = _frame()
    m = _init_map(f)
    im = splat.render_index_map(
        m, jnp2.eye(4), INTR, H, W, time=1.0, time_delta=200, max_depth=5.0)
    im_coarse = splat.render_index_map(
        m, jnp2.eye(4), INTR.level(2), H >> 2, W >> 2,
        time=1.0, time_delta=200, max_depth=5.0)

    ref = splat.combined_predict(im, INTR, 5.0, coarse=(im_coarse, 2))
    out = splat.combined_predict(im, INTR, 5.0, coarse=(im_coarse, 2),
                                 pallas=True, pallas_interpret=True)
    rd, od = np.asarray(ref.depth), np.asarray(out.depth)
    mismatch = np.abs(rd - od) > 1e-5
    assert mismatch.mean() < 3e-3, f"{mismatch.sum()} mismatching pixels"

    # traced intrinsics (jit arg), as _intr_shift produces in the engine
    def run(cx, cy):
        intr2 = CameraIntrinsics(INTR.fx, INTR.fy, cx, cy)
        return splat.combined_predict(im, intr2, 5.0,
                                      pallas=True, pallas_interpret=True).depth

    ref_nc = np.asarray(splat.combined_predict(im, INTR, 5.0).depth)
    outj = np.asarray(jax.jit(run)(jnp2.float32(INTR.cx),
                                   jnp2.float32(INTR.cy)))
    mismatch = np.abs(outj - ref_nc) > 1e-5
    assert mismatch.mean() < 3e-3, f"{mismatch.sum()} mismatching pixels"
