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
