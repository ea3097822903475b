import numpy as np
import jax.numpy as jnp

from maskfusion_tpu.camera import CameraIntrinsics
from maskfusion_tpu.ops import preprocess as pp

INTR = CameraIntrinsics(fx=100.0, fy=120.0, cx=32.0, cy=24.0)


def synth_depth(h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    d = 1.0 + 0.5 * rng.random((h, w)).astype(np.float32)
    return d


def test_vmap_backprojection_roundtrip():
    d = synth_depth()
    vmap = np.asarray(pp.create_vmap(jnp.asarray(d), INTR, depth_cutoff=5.0))
    # pick an interior pixel and verify reprojection
    y, x = 10, 20
    v = vmap[y, x]
    assert np.isfinite(v).all()
    u_proj = v[0] * INTR.fx / v[2] + INTR.cx
    v_proj = v[1] * INTR.fy / v[2] + INTR.cy
    np.testing.assert_allclose([u_proj, v_proj], [x, y], atol=1e-4)
    np.testing.assert_allclose(v[2], d[y, x], atol=1e-6)


def test_vmap_invalid_pixels():
    d = synth_depth()
    d[5, 5] = 0.0
    d[6, 6] = 99.0  # beyond cutoff
    vmap = np.asarray(pp.create_vmap(jnp.asarray(d), INTR, depth_cutoff=5.0))
    assert np.isnan(vmap[5, 5, 0]) and vmap[5, 5, 2] == 0
    assert np.isnan(vmap[6, 6, 0]) and vmap[6, 6, 2] == 0


def test_nmap_plane_normal():
    # A fronto-parallel plane at z=2 must give normals ~ (0, 0, -1) or (0,0,1)
    d = np.full((32, 32), 2.0, np.float32)
    vmap = pp.create_vmap(jnp.asarray(d), INTR, depth_cutoff=5.0)
    nmap = np.asarray(pp.create_nmap(vmap))
    inner = nmap[4:-4, 4:-4]
    assert np.isfinite(inner).all()
    np.testing.assert_allclose(np.abs(inner[..., 2]), 1.0, atol=1e-5)
    # last row/col are NaN like the reference
    assert np.isnan(nmap[-1, 4, 0]) and np.isnan(nmap[4, -1, 0])


def test_bilateral_preserves_constant():
    d = np.full((40, 40), 1.5, np.float32)
    out = np.asarray(pp.bilateral_filter_depth(jnp.asarray(d)))
    np.testing.assert_allclose(out, 1.5, atol=1e-5)


def test_bilateral_smooths_noise_keeps_edges():
    rng = np.random.default_rng(0)
    d = np.full((40, 60), 1.0, np.float32)
    d[:, 30:] = 2.0
    noisy = d + rng.normal(scale=0.005, size=d.shape).astype(np.float32)
    out = np.asarray(pp.bilateral_filter_depth(jnp.asarray(noisy)))
    # noise reduced
    assert np.abs(out[:, :20] - 1.0).std() < np.abs(noisy[:, :20] - 1.0).std()
    # edge preserved: values near the step do not drift toward the other side
    assert np.all(np.abs(out[:, 28] - 1.0) < 0.05)
    assert np.all(np.abs(out[:, 32] - 2.0) < 0.05)


def test_bilateral_zero_invalid():
    d = np.full((20, 20), 1.0, np.float32)
    d[3, 3] = 0.0
    out = np.asarray(pp.bilateral_filter_depth(jnp.asarray(d)))
    assert out[3, 3] == 0.0


def test_pyr_down_depth_shapes_and_holes():
    d = synth_depth(48, 64)
    d[10:12, 10:12] = 0.0
    out = np.asarray(pp.pyr_down_gauss_depth(jnp.asarray(d)))
    assert out.shape == (24, 32)
    assert np.all(out[2:-2, 2:-2] > 0)  # holes filled from valid neighbours
    # constant region stays constant
    d2 = np.full((16, 16), 3.0, np.float32)
    out2 = np.asarray(pp.pyr_down_gauss_depth(jnp.asarray(d2)))
    np.testing.assert_allclose(out2, 3.0, atol=1e-5)


def test_pyr_down_uchar():
    img = np.full((32, 32), 128, np.uint8)
    out = np.asarray(pp.pyr_down_uchar_gauss(jnp.asarray(img)))
    assert out.shape == (16, 16)
    assert np.all(np.abs(out.astype(int) - 128) <= 1)


def test_resize_vmap_nmap():
    d = synth_depth(32, 32)
    vmap = pp.create_vmap(jnp.asarray(d), INTR, 5.0)
    nmap = pp.create_nmap(vmap)
    v2 = np.asarray(pp.resize_vmap(vmap))
    n2 = np.asarray(pp.resize_nmap(nmap))
    assert v2.shape == (16, 16, 3) and n2.shape == (16, 16, 3)
    # normals stay unit where finite
    finite = np.isfinite(n2[..., 0])
    norms = np.linalg.norm(n2[finite], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_transform_maps():
    d = synth_depth(16, 16)
    vmap = pp.create_vmap(jnp.asarray(d), INTR, 5.0)
    nmap = pp.create_nmap(vmap)
    R = jnp.asarray(np.eye(3, dtype=np.float32))
    t = jnp.asarray(np.array([1.0, -2.0, 0.5], np.float32))
    v2, n2 = pp.transform_maps(vmap, nmap, R, t)
    v2, n2 = np.asarray(v2), np.asarray(n2)
    np.testing.assert_allclose(v2[4, 4], np.asarray(vmap)[4, 4] + np.asarray(t), atol=1e-5)
    np.testing.assert_allclose(n2[4, 4], np.asarray(nmap)[4, 4], atol=1e-6)


def test_intensity_weights():
    rgb = np.zeros((4, 4, 3), np.uint8)
    rgb[..., 0] = 100  # R
    out = np.asarray(pp.rgb_to_intensity(jnp.asarray(rgb)))
    assert np.all(out == int(100 * 0.587))


def test_derivatives_on_ramp():
    # horizontal ramp -> dx constant negative (kernel is [-..+] flipped), dy ~ 0
    img = np.tile(np.arange(32, dtype=np.uint8) * 4, (16, 1))
    dx, dy = pp.compute_derivative_images(jnp.asarray(img))
    dx, dy = np.asarray(dx), np.asarray(dy)
    inner_dx = dx[2:-2, 2:-2]
    inner_dy = dy[2:-2, 2:-2]
    assert np.all(inner_dx < 0) or np.all(inner_dx > 0)
    np.testing.assert_allclose(inner_dy, 0.0, atol=1e-4)
    # per row the +-1 taps differ by 8; summed over rows: 8*(2*0.52201+0.79451)
    expected = np.trunc(8 * (2 * 0.52201 + 0.79451))
    np.testing.assert_allclose(inner_dx, expected, atol=1.0)


def test_pyramids_bundle():
    d = synth_depth(64, 64)
    g = (np.ones((64, 64)) * 90).astype(np.uint8)
    m = np.zeros((64, 64), np.uint8)
    levels = pp.build_frame_pyramids(
        jnp.asarray(d), jnp.asarray(g), jnp.asarray(m), INTR, 5.0, 3
    )
    assert len(levels) == 3
    assert levels[0]["depth"].shape == (64, 64)
    assert levels[1]["depth"].shape == (32, 32)
    assert levels[2]["vmap"].shape == (16, 16, 3)
