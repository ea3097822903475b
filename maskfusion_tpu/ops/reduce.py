"""Gauss-Newton reduction ops for camera/object tracking.

TPU-native re-design of the reference's CUDA reduction kernels
(Core/Cuda/reduce.cu): instead of warp-shuffle tree reductions producing a
27-float upper-triangular packing, each op builds a masked (P, k) row matrix
and contracts it on the MXU via one f32 einsum — `A = J^T J`, `b = J^T r`
fall out of the same product.  Everything stays on device; the 6x6 solve is
inlined by the caller (no per-iteration host sync, unlike the reference
which downloads each JtJ: reduce.cu:505-523).

Ops:
  icp_step            — point-to-plane projective ICP term    (ref reduce.cu:259-525)
  compute_rgb_residual — dense photometric correspondences    (ref reduce.cu:774-997)
  rgb_step            — photometric GN term                   (ref reduce.cu:529-713)
  so3_step            — rotation-only image alignment         (ref reduce.cu:999-1202)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from maskfusion_tpu.camera import CameraIntrinsics


def _rowwise_jtj(rows: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Masked (P, k) rows -> (k, k) Gram matrix on the MXU."""
    rows = jnp.where(valid[:, None], rows, 0.0)
    return jnp.einsum("pi,pj->ij", rows, rows, precision="highest")


def _gather2d(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Gather img[y, x] with clipped indices (caller masks validity)."""
    H, W = img.shape[:2]
    yc = jnp.clip(y, 0, H - 1)
    xc = jnp.clip(x, 0, W - 1)
    flat = img.reshape(H * W, *img.shape[2:])
    return flat[yc * W + xc]


def pack_model_maps(vmap_g_prev: jnp.ndarray,
                    nmap_g_prev: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 6) packed model vertex+normal table for icp_step —
    iteration-invariant, build once per pyramid level."""
    H, W = vmap_g_prev.shape[:2]
    return jnp.concatenate(
        [vmap_g_prev.reshape(-1, 3), nmap_g_prev.reshape(-1, 3)], axis=1
    ).reshape(H, W, 6)


def rgb_static_valid(
    next_image: jnp.ndarray,
    next_depth: jnp.ndarray,
    didx: jnp.ndarray,
    didy: jnp.ndarray,
    min_scale: float,
    next_mask: Optional[jnp.ndarray] = None,
    mask_id: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """The iteration-invariant part of the RGB correspondence gates
    (neighbourhood erosion + gradient + interior + depth validity) — hoist
    out of the GN loop; the reference recomputes it every iteration
    (reduce.cu:823-858)."""
    H, W = next_image.shape
    nz = next_image > 0
    if next_mask is not None and mask_id is not None:
        nz = nz & (next_mask == mask_id)
    ok = jnp.ones((H, W), bool)
    nz_pad = jnp.pad(nz, 2, constant_values=True)
    for dy in (-2, -1, 0, 1):
        for dx in (-2, -1, 0, 1):
            ok = ok & nz_pad[2 + dy: 2 + dy + H, 2 + dx: 2 + dx + W]
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    interior = (x < W - 5) & (y < H - 1)
    has_grad = (didx * didx + didy * didy) >= min_scale
    return ok & interior & has_grad & jnp.isfinite(next_depth)


def rgb_last_valid(last_image: jnp.ndarray) -> jnp.ndarray:
    """Model-side validity erosion (iteration-invariant; hoist out of the
    GN loop): True where the 4x4 neighbourhood of the LAST image is all
    nonzero — see compute_rgb_residual for why boundary-contaminated model
    pixels must not feed the photometric term."""
    H, W = last_image.shape
    lv = last_image > 0
    lv_pad = jnp.pad(lv, 2, constant_values=False)
    l_ok = jnp.ones((H, W), bool)
    for dy in (-2, -1, 0, 1):
        for dx in (-2, -1, 0, 1):
            l_ok = l_ok & lv_pad[2 + dy: 2 + dy + H, 2 + dx: 2 + dx + W]
    return l_ok


class GNTerm(NamedTuple):
    A: jnp.ndarray          # (6,6) or (3,3)
    b: jnp.ndarray          # (6,) or (3,)
    residual_sq: jnp.ndarray  # scalar: sum of squared residuals
    count: jnp.ndarray      # scalar: inlier count (float32)


class ICPAssociation(NamedTuple):
    """Frozen projective association: the gathered model rows + ALL gates
    evaluated at association time.  Only the point-to-plane rows
    re-linearise between refreshes; the inlier SET stays frozen — letting
    the dist/sine gates float with the pose shrinks the set as the
    estimate moves and turns the frozen iterations into a runaway on
    small models (measured: a 76-pixel object diverged 23 cm in one
    5-iteration chunk with live gates, 1 cm with frozen ones)."""
    vn: jnp.ndarray            # (P, 6) gathered model vertex+normal (world)
    found: jnp.ndarray         # (P,) bool — every search gate, at assoc pose


def icp_associate(
    R_curr: jnp.ndarray,
    t_curr: jnp.ndarray,
    vmap_curr: jnp.ndarray,
    nmap_curr: jnp.ndarray,
    R_prev_inv: jnp.ndarray,
    t_prev: jnp.ndarray,
    intr: CameraIntrinsics,
    vn_packed: jnp.ndarray,
    dist_thresh: float,
    angle_thresh_sine: float,
    mask: Optional[jnp.ndarray] = None,
    mask_id: Optional[jnp.ndarray] = None,
) -> ICPAssociation:
    """Projective correspondence search (ICPReduction::search,
    reduce.cu:292-366): transform the current-frame vertex into the previous
    (model) camera, project, fetch the model's global-frame vertex/normal at
    that pixel, gate by bounds/finiteness/mask and by the dist/sine inlier
    tests AT THIS POSE.  This is the random-gather (HBM-latency-bound) half
    of icp_step; callers may reuse one association for several GN
    iterations (the reference re-searches every iteration only because
    fragment-shader texture fetches are free there)."""
    H, W = vmap_curr.shape[:2]
    v = vmap_curr.reshape(-1, 3)
    n = nmap_curr.reshape(-1, 3)

    v_g = v @ R_curr.T + t_curr                      # current vertex in world
    v_cp = (v_g - t_prev) @ R_prev_inv.T             # ... in prev camera

    z = v_cp[:, 2]
    u_proj = jnp.round(v_cp[:, 0] * intr.fx / z + intr.cx).astype(jnp.int32)
    v_proj = jnp.round(v_cp[:, 1] * intr.fy / z + intr.cy).astype(jnp.int32)
    in_bounds = (
        (u_proj >= 0) & (v_proj >= 0) & (u_proj < W) & (v_proj < H) & (z >= 0)
    )

    # one 6-wide row-gather instead of two 3-wide (TPU gathers amortise
    # over row width; random-gather throughput is the iteration bottleneck).
    vn = _gather2d(vn_packed, v_proj, u_proj)
    vprev_g = vn[:, 0:3]
    nprev_g = vn[:, 3:6]

    n_g = n @ R_curr.T
    dist = jnp.linalg.norm(vprev_g - v_g, axis=-1)
    sine = jnp.linalg.norm(jnp.cross(n_g, nprev_g), axis=-1)

    found = (
        in_bounds
        & (sine < angle_thresh_sine)
        & (dist <= dist_thresh)
        & jnp.isfinite(n[:, 0])
        & jnp.isfinite(vn[:, 3])
        & jnp.isfinite(v[:, 0])
    )
    if mask is not None and mask_id is not None:
        found = found & (mask.reshape(-1) == mask_id)
    return ICPAssociation(vn=vn, found=found)


def icp_term_from_assoc(
    R_curr: jnp.ndarray,
    t_curr: jnp.ndarray,
    vmap_curr: jnp.ndarray,
    nmap_curr: jnp.ndarray,
    R_prev_inv: jnp.ndarray,
    t_prev: jnp.ndarray,
    assoc: ICPAssociation,
) -> GNTerm:
    """Point-to-plane GN term from an existing association
    (ICPReduction::getProducts, reduce.cu:367-415).  Gather-free: the rows
    [n, s x n, n.(s-d)] re-linearise against the frozen (P, 6) model rows
    with the *current* pose; the inlier set is the association's (see
    ICPAssociation — a floating set destabilises the frozen iterations)."""
    v = vmap_curr.reshape(-1, 3)
    n = nmap_curr.reshape(-1, 3)
    v_g = v @ R_curr.T + t_curr
    vprev_g = assoc.vn[:, 0:3]
    nprev_g = assoc.vn[:, 3:6]
    found = assoc.found

    # rows in the previous camera frame (reduce.cu:367-375)
    s_cp = (v_g - t_prev) @ R_prev_inv.T
    d_cp = (vprev_g - t_prev) @ R_prev_inv.T
    n_cp = nprev_g @ R_prev_inv.T

    resid = jnp.sum(n_cp * (s_cp - d_cp), axis=-1)
    rows = jnp.concatenate(
        [n_cp, jnp.cross(s_cp, n_cp), resid[:, None]], axis=-1
    )
    rows = jnp.where(jnp.isfinite(rows).all(axis=-1, keepdims=True), rows, 0.0)

    jtj = _rowwise_jtj(rows, found)
    return GNTerm(
        A=jtj[:6, :6],
        b=jtj[:6, 6],
        residual_sq=jtj[6, 6],
        count=jnp.sum(found.astype(jnp.float32)),
    )


def icp_step(
    R_curr: jnp.ndarray,
    t_curr: jnp.ndarray,
    vmap_curr: jnp.ndarray,
    nmap_curr: jnp.ndarray,
    R_prev_inv: jnp.ndarray,
    t_prev: jnp.ndarray,
    intr: CameraIntrinsics,
    vmap_g_prev: jnp.ndarray,
    nmap_g_prev: jnp.ndarray,
    dist_thresh: float,
    angle_thresh_sine: float,
    mask: Optional[jnp.ndarray] = None,
    mask_id: Optional[jnp.ndarray] = None,
    vn_packed: Optional[jnp.ndarray] = None,
) -> GNTerm:
    """Point-to-plane projective ICP GN term = associate + products
    (ICPReduction::search/getProducts, reduce.cu:292-415).  The optional
    mask gate replicates the MASK_ICP_RESIDUAL path (reduce.cu:316-324)
    which tests the *current* pixel's label."""
    if vn_packed is None:
        vn_packed = pack_model_maps(vmap_g_prev, nmap_g_prev)
    assoc = icp_associate(
        R_curr, t_curr, vmap_curr, nmap_curr, R_prev_inv, t_prev, intr,
        vn_packed, dist_thresh, angle_thresh_sine, mask, mask_id,
    )
    return icp_term_from_assoc(
        R_curr, t_curr, vmap_curr, nmap_curr, R_prev_inv, t_prev, assoc,
    )


class RGBCorrespondences(NamedTuple):
    valid: jnp.ndarray   # (H, W) bool
    u0: jnp.ndarray      # (H, W) int32 — matched pixel in last image
    v0: jnp.ndarray      # (H, W) int32
    d0: jnp.ndarray      # (H, W) float32 — last depth at the match
    diff: jnp.ndarray    # (H, W) float32 — next - last intensity
    sigma_sum: jnp.ndarray  # scalar sum of diff^2 over valid
    count: jnp.ndarray      # scalar valid count (float32)


def compute_rgb_residual(
    didx: jnp.ndarray,
    didy: jnp.ndarray,
    last_depth: jnp.ndarray,
    next_depth: jnp.ndarray,
    last_image: jnp.ndarray,
    next_image: jnp.ndarray,
    krk_inv: jnp.ndarray,
    kt: jnp.ndarray,
    min_scale: float,
    max_depth_delta: float,
    next_mask: Optional[jnp.ndarray] = None,
    mask_id: Optional[jnp.ndarray] = None,
    static_valid: Optional[jnp.ndarray] = None,
    last_valid: Optional[jnp.ndarray] = None,
) -> RGBCorrespondences:
    """Dense photometric correspondence search (RGBResidual, reduce.cu:811-891).

    For each pixel of the *next* image with enough gradient, warp by the
    current inverse increment (K R K^-1, K t) using next-frame depth, and
    accept if the depth at the warped last-frame pixel is consistent.  The
    4x4 validity neighbourhood (rows [i-2,i+2), cols [j-2,j+2)) requires
    nextImage > 0 and, when masking, label == mask_id (reduce.cu:829-841)."""
    H, W = next_image.shape
    if static_valid is None:
        static_valid = rgb_static_valid(
            next_image, next_depth, didx, didy, min_scale,
            next_mask, mask_id)
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    d1 = next_depth

    td1 = d1 * (krk_inv[2, 0] * x + krk_inv[2, 1] * y + krk_inv[2, 2]) + kt[2]
    u0f = (d1 * (krk_inv[0, 0] * x + krk_inv[0, 1] * y + krk_inv[0, 2]) + kt[0]) / td1
    v0f = (d1 * (krk_inv[1, 0] * x + krk_inv[1, 1] * y + krk_inv[1, 2]) + kt[1]) / td1
    u0 = jnp.round(u0f).astype(jnp.int32)
    v0 = jnp.round(v0f).astype(jnp.int32)
    in_b = (u0 >= 0) & (v0 >= 0) & (u0 < W) & (v0 < H)

    # Model-side validity erosion: a small model's intensity image is a
    # patch in a zero canvas, and the pyramid's tent resize BLEEDS the zero
    # background into boundary pixels at coarse levels — warped samples
    # there pass the li != 0 gate with darkened values and bias the
    # photometric term (measured: a static 40x45 px object absorbed 2.4 cm
    # of spurious motion in one frame).  Drop warped samples whose 4x4
    # neighbourhood in the LAST image contains invalid pixels — the mirror
    # of the next-side erosion the reference applies (reduce.cu:829-841).
    if last_valid is None:
        last_valid = rgb_last_valid(last_image)
    l_ok = last_valid

    # one 3-wide row-gather for (depth, intensity, validity) at the warp
    di_packed = jnp.stack(
        [last_depth, last_image.astype(jnp.float32),
         l_ok.astype(jnp.float32)], axis=-1)
    di = _gather2d(di_packed, v0.reshape(-1), u0.reshape(-1)).reshape(H, W, 3)
    d0 = di[..., 0]
    li = di[..., 1]

    depth_ok = ((d0 > 0) & (jnp.abs(td1 - d0) <= max_depth_delta)
                & (di[..., 2] > 0.5))
    valid = static_valid & in_b & depth_ok

    diff = next_image.astype(jnp.float32) - li
    diff = jnp.where(valid, diff, 0.0)
    return RGBCorrespondences(
        valid=valid,
        u0=u0,
        v0=v0,
        d0=jnp.where(valid, d0, 0.0),
        diff=diff,
        sigma_sum=jnp.sum(diff * diff),
        count=jnp.sum(valid.astype(jnp.float32)),
    )


def rgb_step(
    corres: RGBCorrespondences,
    sigma: jnp.ndarray,
    intr: CameraIntrinsics,
    didx: jnp.ndarray,
    didy: jnp.ndarray,
    sobel_scale: float,
) -> GNTerm:
    """Photometric GN term from correspondences (RGBReduction,
    reduce.cu:547-630).  `sigma` follows the reference driver's convention
    (RGBDOdometry.cpp:389-401): the valid-count, 1 when error is zero, or -1
    to signal even weighting (rgb-only tracking).

    The reference gathers the matched pixel's cloud point from a
    projectToPointCloud buffer (reduce.cu:570-572); back-projecting the
    already-gathered depth analytically removes that gather entirely."""
    H, W = corres.valid.shape
    fx, fy = intr.fx, intr.fy
    valid = corres.valid.reshape(-1)
    diff = corres.diff.reshape(-1)

    w = sigma + jnp.abs(diff)
    w = jnp.where(w > 1.1920929e-07, 1.0 / w, 1.0)
    w = jnp.where(sigma == -1.0, 1.0, w)

    # cloud point at the matched *last* pixel, from its gathered depth
    u0 = corres.u0.reshape(-1).astype(jnp.float32)
    v0 = corres.v0.reshape(-1).astype(jnp.float32)
    z = corres.d0.reshape(-1)
    cp = jnp.stack([
        (u0 - intr.cx) * z / fx,
        (v0 - intr.cy) * z / fy,
        z,
    ], axis=-1)
    invz = jnp.where(z != 0, 1.0 / z, 0.0)

    # gradient at the *next* pixel (corres.one == the pixel itself)
    gx = w * sobel_scale * didx.reshape(-1)
    gy = w * sobel_scale * didy.reshape(-1)

    r0 = gx * fx * invz
    r1 = gy * fy * invz
    r2 = -(r0 * cp[:, 0] + r1 * cp[:, 1]) * invz
    r3 = -cp[:, 2] * r1 + cp[:, 1] * r2
    r4 = cp[:, 2] * r0 - cp[:, 0] * r2
    r5 = -cp[:, 1] * r0 + cp[:, 0] * r1
    r6 = -w * diff

    rows = jnp.stack([r0, r1, r2, r3, r4, r5, r6], axis=-1)
    rows = jnp.where(jnp.isfinite(rows).all(axis=-1, keepdims=True), rows, 0.0)
    jtj = _rowwise_jtj(rows, valid)
    return GNTerm(
        A=jtj[:6, :6],
        b=jtj[:6, 6],
        residual_sq=jtj[6, 6],
        count=jnp.sum(valid.astype(jnp.float32)),
    )


def so3_step(
    last_image: jnp.ndarray,
    next_image: jnp.ndarray,
    image_basis: jnp.ndarray,   # K R K^-1 (3,3)
    k_inv: jnp.ndarray,         # (3,3)
    krlr: jnp.ndarray,          # K R (3,3)
) -> GNTerm:
    """Rotation-only photometric alignment on the coarsest pyramid level
    (SO3Reduction, reduce.cu:999-1137).  Returns a 3x3 GN term over the
    rotation vector."""
    H, W = last_image.shape
    lastf = last_image.astype(jnp.float32)
    nextf = next_image.astype(jnp.float32)

    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    ones = jnp.ones_like(x)
    p = jnp.stack([x, y, ones], axis=-1)                       # (H, W, 3)

    warped = jnp.einsum("ij,hwj->hwi", image_basis, p, precision="highest")
    wx = jnp.round(warped[..., 0] / warped[..., 2]).astype(jnp.int32)
    wy = jnp.round(warped[..., 1] / warped[..., 2]).astype(jnp.int32)

    found = (
        (wx >= 1) & (wx < W - 1) & (wy >= 1) & (wy < H - 1)
        & (x >= 1) & (x < W - 1) & (y >= 1) & (y < H - 1)
    )

    # getGradient: (back - fore) / 2 at integer pixels.  The last-image
    # gradient is at the pixel itself — dense shifts, no gather.  The
    # next-image needs its 3x3-cross taps at the warped pixel: pack them
    # into a (H, W, 5) table with dense shifts and fetch with ONE 5-wide
    # row-gather (random-gather latency dominates this kernel; five
    # separate 1-wide gathers serialise it).
    def shift(img, dy, dx):
        pad = ((max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx)))
        return jnp.pad(img, pad)[max(0, dy):max(0, dy) + H,
                                 max(0, dx):max(0, dx) + W]

    # (back - fore) / 2:  back_x = img[y, x-1] = shift(img, 0, -1)
    glx = (shift(lastf, 0, -1) - shift(lastf, 0, 1)) * 0.5
    gly = (shift(lastf, -1, 0) - shift(lastf, 1, 0)) * 0.5

    packed = jnp.stack(
        [shift(nextf, 0, -1), shift(nextf, 0, 1),
         shift(nextf, -1, 0), shift(nextf, 1, 0), nextf], axis=-1)
    taps = _gather2d(packed, wy.reshape(-1), wx.reshape(-1)).reshape(H, W, 5)
    gnx = (taps[..., 0] - taps[..., 1]) * 0.5
    gny = (taps[..., 2] - taps[..., 3]) * 0.5
    next_at_w = taps[..., 4]
    gx = (gnx + glx) * 0.5
    gy = (gny + gly) * 0.5

    point = jnp.einsum("ij,hwj->hwi", k_inv, p, precision="highest")
    z2 = point[..., 2] * point[..., 2]

    a, b_, c = krlr[0, 0], krlr[0, 1], krlr[0, 2]
    d, e, f = krlr[1, 0], krlr[1, 1], krlr[1, 2]
    g, h, i_ = krlr[2, 0], krlr[2, 1], krlr[2, 2]

    lp0 = (point[..., 2] * (d * gy + a * gx) - gy * g * y - gx * g * x) / z2
    lp1 = (point[..., 2] * (e * gy + b_ * gx) - gy * h * y - gx * h * x) / z2
    lp2 = (point[..., 2] * (f * gy + c * gx) - gy * i_ * y - gx * i_ * x) / z2
    left = jnp.stack([lp0, lp1, lp2], axis=-1)
    jac = jnp.cross(left, point)

    next_at_w = _gather2d(nextf, wy.reshape(-1), wx.reshape(-1)).reshape(H, W)
    resid = -(next_at_w - lastf)

    rows = jnp.concatenate([jac, resid[..., None]], axis=-1).reshape(-1, 4)
    rows = jnp.where(jnp.isfinite(rows).all(axis=-1, keepdims=True), rows, 0.0)
    jtj = _rowwise_jtj(rows, found.reshape(-1))
    return GNTerm(
        A=jtj[:3, :3],
        b=jtj[:3, 3],
        residual_sq=jtj[3, 3],
        count=jnp.sum(found.astype(jnp.float32)),
    )
