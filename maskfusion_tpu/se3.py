"""SE(3)/SO(3) helpers in JAX.

TPU-native equivalent of the reference's OdometryProvider
(Core/Utils/OdometryProvider.h:31-93) and Model::rodrigues2
(Core/Model/Model.cpp:891-932).  Everything is float32, traced, and
branch-free (lax.select / where) so it can live inside jit/scan loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (3,) -> rotation matrix (3,3).

    Matches OdometryProvider::rodrigues (OdometryProvider.h:32-67):
    R = cos(t) I + (1-cos t) rr^T + sin(t) [r]_x, identity for tiny angles.
    """
    theta = jnp.linalg.norm(rvec)
    safe_theta = jnp.where(theta < _EPS, 1.0, theta)
    r = rvec / safe_theta
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    c1 = 1.0 - c
    rrt = jnp.outer(r, r)
    rx = jnp.array(
        [
            [0.0, -r[2], r[1]],
            [r[2], 0.0, -r[0]],
            [-r[1], r[0], 0.0],
        ],
        dtype=rvec.dtype,
    )
    R = c * jnp.eye(3, dtype=rvec.dtype) + c1 * rrt + s * rx
    return jnp.where(theta < _EPS, jnp.eye(3, dtype=rvec.dtype), R)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> axis-angle (3,). Inverse of `rodrigues`.

    Equivalent of Model::rodrigues2 (Model.cpp:891-932)."""
    rx = R[2, 1] - R[1, 2]
    ry = R[0, 2] - R[2, 0]
    rz = R[1, 0] - R[0, 1]
    s = 0.5 * jnp.sqrt(rx * rx + ry * ry + rz * rz + _EPS)
    c = jnp.clip(0.5 * (jnp.trace(R) - 1.0), -1.0, 1.0)
    theta = jnp.arccos(c)
    # Generic case
    vth = 0.5 / jnp.maximum(s, _EPS)
    generic = theta * vth * jnp.array([rx, ry, rz], dtype=R.dtype)
    # theta ~ pi case: extract axis from diagonal
    diag = jnp.clip((jnp.diag(R) + 1.0) * 0.5, 0.0, None)
    axis = jnp.sqrt(diag)
    axis = axis * jnp.sign(jnp.array([rx if False else 1.0, 1.0, 1.0], dtype=R.dtype))
    # sign fixes using off-diagonals
    sx = jnp.where(R[2, 1] + R[1, 2] < 0, -1.0, 1.0)
    # keep it simple: the pi case is rare in incremental tracking
    pi_case = theta * axis * jnp.array([1.0, sx, sx], dtype=R.dtype)
    small = jnp.array([0.0, 0.0, 0.0], dtype=R.dtype)
    out = jnp.where(s < 1e-5, jnp.where(c > 0, small, pi_case), generic)
    return out


def se3_exp_update(result_rt: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Left-multiply the incremental GN solution onto the running transform.

    Matches OdometryProvider::computeUpdateSE3 (OdometryProvider.h:69-85):
    x = [t(3), rvec(3)];  Rt = [rodrigues(rvec) | t];  return Rt @ result_rt.
    """
    R = rodrigues(x[3:6])
    Rt = jnp.eye(4, dtype=result_rt.dtype)
    Rt = Rt.at[:3, :3].set(R)
    Rt = Rt.at[:3, 3].set(x[:3])
    return Rt @ result_rt


def make_pose(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    T = jnp.eye(4, dtype=R.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


def pose_inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = T[:3, :3]
    t = T[:3, 3]
    Ti = jnp.eye(4, dtype=T.dtype)
    Ti = Ti.at[:3, :3].set(R.T)
    Ti = Ti.at[:3, 3].set(-R.T @ t)
    return Ti


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply 4x4 pose to (..., 3) points."""
    return (
        jnp.einsum("...i,ji->...j", pts, T[:3, :3], precision="highest") + T[:3, 3]
    )


def rotate_vectors(T: jnp.ndarray, vecs: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...i,ji->...j", vecs, T[:3, :3], precision="highest")


def solve_6x6_ldlt(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Small dense solve used inside the GN loop.

    The reference downloads JtJ to the host and runs Eigen LDLT
    (RGBDOdometry.cpp:451); we keep it on-device — a 6x6 Cholesky is
    negligible next to the reductions and avoids a device->host sync
    per iteration."""
    # Relative Tikhonov damping: near-flat objects make point-to-plane ICP
    # singular along surface-tangential directions, and with no photometric
    # rows those directions' updates are pure noise amplified by the solve.
    # Damping proportional to trace leaves well-constrained directions
    # untouched (~1e-4 relative) and pins unconstrained ones at ~zero.
    # (The reference's raw Eigen LDLT has this instability; its object
    # tracking relies on the RGB term always being populated.)
    dim = A.shape[0]
    lam = 1e-4 * jnp.trace(A) / dim + 1e-12
    A = A + lam * jnp.eye(dim, dtype=A.dtype)
    x = _solve_chol_unrolled(A, b)
    ok = jnp.all(jnp.isfinite(x))
    return jnp.where(ok, x, jnp.zeros_like(x))


def _chol_unrolled(A):
    """Fully unrolled scalar Cholesky of a small (n<=6) SPD matrix.

    jax.scipy.linalg.cholesky / solve_triangular lower to TPU's BLOCKED
    128-padded serial routines — one 6x6 solve inside the fused tracking
    step measured ~1 ms, and the GN loop runs 19 of them (plus the 6x6
    covariance inverse via jnp.linalg.inv at ~25 ms).  ~n^3/6 explicit
    scalar ops fuse into the surrounding kernel instead.  Returns the
    lower-triangle entries as a python list-of-lists of scalars."""
    n = A.shape[0]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        s = A[i, i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-30))
        L[i][i] = d
        inv_d = 1.0 / d
        for j in range(i + 1, n):
            s2 = A[j, i]
            for k in range(i):
                s2 = s2 - L[j][k] * L[i][k]
            L[j][i] = s2 * inv_d
    return L


def _solve_chol_unrolled(A, b):
    L = _chol_unrolled(A)
    n = len(L)
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def spd_inverse_small(A: jnp.ndarray) -> jnp.ndarray:
    """Dense inverse of a small SPD matrix via the unrolled Cholesky —
    the covariance of the GN system (RGBDOdometry.cpp:499 does the same
    LDLT-solve of the identity host-side).  jnp.linalg.inv's pivoted-LU
    lowering measured ~25 ms for a 6x6 inside the fused step on TPU."""
    n = A.shape[0]
    L = _chol_unrolled(A)
    cols = []
    for c in range(n):
        y = [None] * n
        for i in range(n):
            s = jnp.asarray(1.0 if i == c else 0.0, A.dtype)
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s / L[i][i]
        x = [None] * n
        for i in reversed(range(n)):
            s = y[i]
            for k in range(i + 1, n):
                s = s - L[k][i] * x[k]
            x[i] = s / L[i][i]
        cols.append(jnp.stack(x))
    return jnp.stack(cols, axis=1)


def to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (qx, qy, qz, qw), TUM export order
    (MaskFusion.cpp:860-871 uses Eigen::Quaternionf)."""
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22

    def case_w():
        s = jnp.sqrt(jnp.maximum(tr + 1.0, 0.0)) * 2.0
        return jnp.stack([(m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s, 0.25 * s])

    def case_x():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) * 2.0
        return jnp.stack([0.25 * s, (m01 + m10) / s, (m02 + m20) / s, (m21 - m12) / s])

    def case_y():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, 0.0)) * 2.0
        return jnp.stack([(m01 + m10) / s, 0.25 * s, (m12 + m21) / s, (m02 - m20) / s])

    def case_z():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, 0.0)) * 2.0
        return jnp.stack([(m02 + m20) / s, (m12 + m21) / s, 0.25 * s, (m10 - m01) / s])

    idx = jnp.argmax(jnp.stack([tr, m00, m11, m22]))
    q = jax.lax.switch(
        jnp.where(tr > 0, 0, idx + 1).astype(jnp.int32) % 4,
        [case_w, case_x, case_y, case_z],
    )
    return q / jnp.linalg.norm(q)
