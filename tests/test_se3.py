import numpy as np
import jax.numpy as jnp

from maskfusion_tpu import se3


def test_rodrigues_matches_scipy_style():
    rng = np.random.default_rng(0)
    for _ in range(10):
        rvec = rng.normal(size=3) * 0.5
        R = np.asarray(se3.rodrigues(jnp.asarray(rvec, jnp.float32)))
        # Compare against the classic Rodrigues formula in numpy float64
        theta = np.linalg.norm(rvec)
        r = rvec / theta
        K = np.array([[0, -r[2], r[1]], [r[2], 0, -r[0]], [-r[1], r[0], 0]])
        R_ref = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * K @ K
        np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_rodrigues_zero():
    R = np.asarray(se3.rodrigues(jnp.zeros(3, jnp.float32)))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-7)


def test_log_exp_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(5):
        rvec = rng.normal(size=3)
        rvec = rvec / np.linalg.norm(rvec) * rng.uniform(0.01, 2.5)
        R = se3.rodrigues(jnp.asarray(rvec, jnp.float32))
        back = np.asarray(se3.so3_log(R))
        np.testing.assert_allclose(back, rvec, atol=1e-3)


def test_pose_inverse():
    rng = np.random.default_rng(2)
    rvec = rng.normal(size=3)
    t = rng.normal(size=3)
    T = se3.make_pose(se3.rodrigues(jnp.asarray(rvec, jnp.float32)),
                      jnp.asarray(t, jnp.float32))
    I = np.asarray(T @ se3.pose_inverse(T))
    np.testing.assert_allclose(I, np.eye(4), atol=1e-5)


def test_se3_exp_update_identity():
    T = jnp.eye(4)
    out = np.asarray(se3.se3_exp_update(T, jnp.zeros(6)))
    np.testing.assert_allclose(out, np.eye(4), atol=1e-7)


def test_solve_6x6():
    rng = np.random.default_rng(3)
    J = rng.normal(size=(40, 6))
    A = (J.T @ J).astype(np.float32)
    x_true = rng.normal(size=6).astype(np.float32)
    b = A @ x_true
    x = np.asarray(se3.solve_6x6_ldlt(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(x, x_true, rtol=2e-2, atol=2e-3)


def test_quaternion_roundtrip():
    rng = np.random.default_rng(4)
    for _ in range(5):
        rvec = rng.normal(size=3)
        R = se3.rodrigues(jnp.asarray(rvec, jnp.float32))
        q = np.asarray(se3.to_quaternion(R))
        x, y, z, w = q
        R_back = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ])
        np.testing.assert_allclose(np.asarray(R), R_back, atol=1e-4)
