"""Depth/RGB preprocessing ops (pure-XLA reference implementations).

TPU-native re-design of the reference's preprocessing kernels:
  - bilateral depth filter        (ref: Core/Shaders/depth_bilateral_metric.frag:31-76)
  - NaN-aware Gaussian pyramids   (ref: Core/Cuda/cudafuncs.cu:333-364, 534-564)
  - vertex / normal maps          (ref: cudafuncs.cu:109-205)
  - map transform / 2x resize     (ref: cudafuncs.cu:207-269, 366-445)
  - intensity + derivative images (ref: cudafuncs.cu:626-715)
  - point-cloud projection        (ref: cudafuncs.cu:718-751)

Conventions: images are (H, W[, C]) arrays; vertex/normal maps are (H, W, 3)
float32 with NaN marking invalid entries (matching the CUDA qnan convention).
All functions are jit-safe with static shapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from maskfusion_tpu.camera import CameraIntrinsics

_NAN = jnp.nan


def _shift(img: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    """Return img sampled at (y+dy, x+dx) with constant fill outside. Static
    offsets -> pure slices, fused by XLA."""
    H, W = img.shape[:2]
    pad_width = [(max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx))]
    pad_width += [(0, 0)] * (img.ndim - 2)
    p = jnp.pad(img, pad_width, constant_values=fill)
    return p[max(0, dy):max(0, dy) + H, max(0, dx):max(0, dx) + W]


def _shift_edge(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift with edge-replicate padding."""
    H, W = img.shape[:2]
    pad_width = [(max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx))]
    pad_width += [(0, 0)] * (img.ndim - 2)
    p = jnp.pad(img, pad_width, mode="edge")
    return p[max(0, dy):max(0, dy) + H, max(0, dx):max(0, dx) + W]


# ---------------------------------------------------------------------------
# Bilateral depth filter (main tracking-depth filter)
# ---------------------------------------------------------------------------

def bilateral_filter_depth(
    depth: jnp.ndarray,
    radius: int = 6,
    sigma_space2_inv_half: float = 0.024691358,
    sigma_color2_inv_half: float = 555.556,
    min_valid_depth: float = 0.03,
) -> jnp.ndarray:
    """Spatial+range bilateral filter over metric depth.

    Mirrors depth_bilateral_metric.frag:31-76: pixels with depth <= 0.03 m
    output 0; the window is (2R+1)^2 with Gaussian space and range weights.
    Zero-depth neighbours contribute with their (large) range penalty exactly
    as in the reference.
    """
    depth = depth.astype(jnp.float32)
    padded = jnp.pad(depth, radius, constant_values=jnp.inf)
    H, W = depth.shape

    # static unrolled window: XLA fuses the (2R+1)^2 shifted taps into one
    # elementwise kernel (a lax.scan here costs one launch per tap on TPU)
    sum1 = jnp.zeros_like(depth)
    sum2 = jnp.zeros_like(depth)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            nb = padded[radius + dy: radius + dy + H,
                        radius + dx: radius + dx + W]
            space2 = float(dy * dy + dx * dx)
            color2 = (depth - nb) ** 2
            w = jnp.exp(-(space2 * sigma_space2_inv_half
                          + color2 * sigma_color2_inv_half))
            ok = jnp.isfinite(nb)
            sum1 = sum1 + jnp.where(ok, nb * w, 0.0)
            sum2 = sum2 + jnp.where(ok, w, 0.0)
    out = sum1 / jnp.maximum(sum2, 1e-20)
    return jnp.where(depth <= min_valid_depth, 0.0, out)


# ---------------------------------------------------------------------------
# Gaussian pyramid downsampling
# ---------------------------------------------------------------------------

_BINOMIAL5 = (1.0, 4.0, 6.0, 4.0, 1.0)


def _decimate2(a: jnp.ndarray) -> jnp.ndarray:
    """a[0::2, 0::2] via a one-hot strided conv.  TPU strided slicing pays
    lane/sublane shuffles (~1 ms per VGA field, scripts/tpu_probe_decimate);
    the conv lowering is ~5x faster.  Exact for f32 payloads and for
    integer-valued floats below 2^24."""
    if a.shape[0] % 2 or a.shape[1] % 2:
        return a[0::2, 0::2]
    x = a.astype(jnp.float32)[None, None]
    k = jnp.zeros((1, 1, 2, 2), jnp.float32).at[0, 0, 0, 0].set(1.0)
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(2, 2), padding="VALID")[0, 0]
    return y.astype(a.dtype) if a.dtype != jnp.float32 else y


def _separable_masked_blur(vals: jnp.ndarray, valid: jnp.ndarray):
    """5-tap binomial blur of (valid*vals) and valid, separably — 10
    contiguous shifted adds instead of 25 strided taps (lane-strided loads
    are slow on TPU; one [::2, ::2] subsample at the end is cheap)."""
    H, W = vals.shape
    v = jnp.where(valid, vals, 0.0)
    wsum = valid.astype(jnp.float32)

    def blur_axis(a, axis):
        pad = [(2, 2), (0, 0)] if axis == 0 else [(0, 0), (2, 2)]
        p = jnp.pad(a, pad, constant_values=0.0)
        out = jnp.zeros_like(a)
        for k, wk in enumerate(_BINOMIAL5):
            if axis == 0:
                out = out + wk * p[k:k + H, :]
            else:
                out = out + wk * p[:, k:k + W]
        return out

    v = blur_axis(blur_axis(v, 0), 1)
    wsum = blur_axis(blur_axis(wsum, 0), 1)
    return v, wsum


def pyr_down_gauss_depth(src: jnp.ndarray) -> jnp.ndarray:
    """Half-resolution 5x5 binomial downsample of float depth, skipping NaN
    taps and renormalising (ref pyrDownKernelGaussF, cudafuncs.cu:333-364).
    Zero-depth (invalid) taps are excluded like NaNs so holes do not bleed."""
    H, W = src.shape
    h, w = H // 2, W // 2
    srcf = src.astype(jnp.float32)
    valid = jnp.isfinite(srcf) & (srcf > 0)
    sum_v, sum_w = _separable_masked_blur(srcf, valid)
    sum_v = _decimate2(sum_v[:2 * h, :2 * w])
    sum_w = _decimate2(sum_w[:2 * h, :2 * w])
    out = sum_v / jnp.maximum(sum_w, 1e-20)
    return jnp.where(sum_w > 0, out, 0.0)


def pyr_down_uchar_gauss(src: jnp.ndarray) -> jnp.ndarray:
    """Half-resolution 5x5 binomial downsample of a uint8 image, counting only
    taps > 0 (ref pyrDownKernelIntensityGauss, cudafuncs.cu:534-564 — the >0
    gate stops incomplete model images from inventing colors)."""
    H, W = src.shape
    h, w = H // 2, W // 2
    srcf = src.astype(jnp.float32)
    sum_v, sum_w = _separable_masked_blur(srcf, srcf > 0)
    sum_v = _decimate2(sum_v[:2 * h, :2 * w])
    sum_w = _decimate2(sum_w[:2 * h, :2 * w])
    out = sum_v / jnp.maximum(sum_w, 1e-20)
    return out.astype(src.dtype)


def pyr_down_mask_nearest(src: jnp.ndarray) -> jnp.ndarray:
    """Half-resolution nearest-neighbour downsample for label images.

    The reference reuses pyrDownUcharGauss for mask pyramids
    (RGBDOdometry.cpp:200), which *averages instance ids* — a defect we do not
    reproduce; nearest sampling preserves label semantics."""
    return _decimate2(src)


# ---------------------------------------------------------------------------
# Vertex / normal maps
# ---------------------------------------------------------------------------

def create_vmap(
    depth: jnp.ndarray, intr: CameraIntrinsics, depth_cutoff: float
) -> jnp.ndarray:
    """Back-project depth to a camera-frame vertex map (H, W, 3).

    Matches computeVmapKernel (cudafuncs.cu:109-134): invalid pixels get
    NaN x/y and z = 0."""
    H, W = depth.shape
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    z = depth.astype(jnp.float32)
    valid = (z > 0.0) & (z < depth_cutoff)
    x = z * (u - intr.cx) / intr.fx
    y = z * (v - intr.cy) / intr.fy
    vx = jnp.where(valid, x, _NAN)
    vy = jnp.where(valid, y, _NAN)
    vz = jnp.where(valid, z, 0.0)
    return jnp.stack([vx, vy, vz], axis=-1)


def create_nmap(vmap: jnp.ndarray) -> jnp.ndarray:
    """Cross-product normal map from a vertex map (H, W, 3) -> (H, W, 3).

    Matches computeNmapKernel (cudafuncs.cu:152-189): n = normalize(
    (v[y,x+1]-v) x (v[y+1,x]-v)), NaN on the last row/col or missing data."""
    H, W = vmap.shape[:2]
    v00 = vmap
    v01 = _shift(vmap, 0, 1, _NAN)   # (y, x+1)
    v10 = _shift(vmap, 1, 0, _NAN)   # (y+1, x)
    valid = (
        jnp.isfinite(v00[..., 0]) & jnp.isfinite(v01[..., 0]) & jnp.isfinite(v10[..., 0])
    )
    c = jnp.cross(v01 - v00, v10 - v00)
    norm = jnp.linalg.norm(c, axis=-1, keepdims=True)
    n = c / jnp.maximum(norm, 1e-20)
    return jnp.where(valid[..., None], n, _NAN)


def transform_maps(
    vmap: jnp.ndarray, nmap: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SE(3)-transform vertex map, rotate normal map (ref tranformMapsKernel,
    cudafuncs.cu:207-248). NaN entries stay NaN."""
    v_valid = jnp.isfinite(vmap[..., 0])
    n_valid = jnp.isfinite(nmap[..., 0])
    # einsum at HIGHEST precision: tiny contraction, rounding matters for ICP
    v_out = jnp.einsum("...i,ji->...j", vmap, R, precision="highest") + t
    n_out = jnp.einsum("...i,ji->...j", nmap, R, precision="highest")
    v_out = jnp.where(v_valid[..., None], v_out, _NAN)
    n_out = jnp.where(n_valid[..., None], n_out, _NAN)
    return v_out, n_out


def _resize_half(m: jnp.ndarray, normalize: bool) -> jnp.ndarray:
    """2x downsample of a (H, W, 3) map; NaN where any tap is NaN
    (ref resizeMapKernel, cudafuncs.cu:366-417 — with one deliberate fix).

    The reference averages the 2x2 block starting at (2y, 2x), which
    centres the coarse texel at (2y+0.5, 2x+0.5) — while the depth/image
    pyramids it is matched against (pyrDownGaussF) centre theirs at
    (2y, 2x).  That half-texel misregistration biases every coarse-level
    GN solve by ~quarter-texel of 3D offset; large models average it out
    at level 0, but a small object model (tens of coarse pixels) inherits
    a systematic per-frame drift that compounds into tracking failure
    (measured: 12 mm/solve on a 1900-px object, >1 m over 70 frames).
    A centre-aligned 3x3 tent (stride 2, pad 1) registers the model
    pyramid with the frame pyramid exactly.

    One strided conv per channel instead of strided slices: TPU strided
    slicing pays lane/sublane shuffles (scripts/tpu_probe_decimate.py),
    and NaN taps propagate through the convolution like the explicit
    any-NaN gate."""
    x = m.transpose(2, 0, 1)[:, None]                    # (3, 1, H, W)
    # NaN edge padding keeps the any-NaN semantics at the borders
    x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)),
                constant_values=jnp.nan)
    k1 = jnp.asarray([1.0, 2.0, 1.0], m.dtype) / 4.0
    k = (k1[:, None] * k1[None, :]).reshape(1, 1, 3, 3)
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(2, 2), padding="VALID")
    avg = y[:, 0].transpose(1, 2, 0)
    if normalize:
        avg = avg / jnp.maximum(jnp.linalg.norm(avg, axis=-1, keepdims=True), 1e-20)
    return avg


def resize_vmap(m: jnp.ndarray) -> jnp.ndarray:
    return _resize_half(m, normalize=False)


def resize_nmap(m: jnp.ndarray) -> jnp.ndarray:
    return _resize_half(m, normalize=True)


def vertices_to_depth(vmap: jnp.ndarray, cutoff: float) -> jnp.ndarray:
    """Extract the z plane of a vertex map as a depth image with NaN outside
    (0, cutoff] (ref verticesToDepthKernel, cudafuncs.cu:602-613)."""
    z = vmap[..., 2]
    return jnp.where((z > 0) & (z <= cutoff) & jnp.isfinite(z), z, _NAN)


# ---------------------------------------------------------------------------
# Intensity + gradients
# ---------------------------------------------------------------------------

def rgb_to_intensity(rgb: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) uint8 RGB -> (H, W) uint8 grayscale.

    The reference's bgr2IntensityKernel (cudafuncs.cu:626-639) computes
    0.114*c0 + 0.299*c1 + 0.587*c2 on BGR-ordered frames, i.e. luminance
    0.587R + 0.299G + 0.114B; we apply the same weights to RGB input."""
    f = rgb.astype(jnp.float32)
    val = f[..., 0] * 0.587 + f[..., 1] * 0.299 + f[..., 2] * 0.114
    return val.astype(jnp.uint8)


_GSOBEL_X = (
    (0.52201, 0.00000, -0.52201),
    (0.79451, -0.00000, -0.79451),
    (0.52201, 0.00000, -0.52201),
)
_GSOBEL_Y = (
    (0.52201, 0.79451, 0.52201),
    (0.00000, 0.00000, 0.00000),
    (-0.52201, -0.79451, -0.52201),
)


def compute_derivative_images(
    intensity: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Smoothed image gradients dI/dx, dI/dy as float32.

    Matches applyKernel (cudafuncs.cu:658-683) in the interior; the border
    uses edge replication instead of the reference's misaligned partial
    windows.  The reference truncates to int16; we keep float (results feed
    float math scaled by sobelScale anyway)."""
    src = intensity.astype(jnp.float32)
    dx = jnp.zeros_like(src)
    dy = jnp.zeros_like(src)
    # kernel is indexed back-to-front in the reference (kernelIndex = 8 ... 0)
    for j in (-1, 0, 1):
        for i in (-1, 0, 1):
            tap = _shift_edge(src, j, i)
            kx = _GSOBEL_X[1 - j][1 - i]
            ky = _GSOBEL_Y[1 - j][1 - i]
            dx = dx + tap * kx
            dy = dy + tap * ky
    # int16 truncation like the reference's short stores
    return jnp.trunc(dx), jnp.trunc(dy)


def project_to_pointcloud(
    depth: jnp.ndarray, intr: CameraIntrinsics
) -> jnp.ndarray:
    """Depth -> (H, W, 3) camera-frame points, no validity gating
    (ref projectPointsKernel, cudafuncs.cu:718-736)."""
    H, W = depth.shape
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    z = depth.astype(jnp.float32)
    x = (u - intr.cx) * z / intr.fx
    y = (v - intr.cy) * z / intr.fy
    return jnp.stack([x, y, z], axis=-1)


# ---------------------------------------------------------------------------
# Frame pyramid bundle
# ---------------------------------------------------------------------------

def build_frame_pyramids(
    filtered_depth: jnp.ndarray,
    intensity: jnp.ndarray,
    mask: jnp.ndarray,
    intr: CameraIntrinsics,
    depth_cutoff: float,
    num_levels: int = 3,
):
    """Per-frame pyramid stack shared by all models (ref
    Model::generateCUDATextures, Model.cpp:350-389): depth, intensity, mask,
    vmap, nmap per level.  Returns tuple of per-level dicts."""
    levels = []
    d, g, m = filtered_depth, intensity, mask
    for i in range(num_levels):
        if i > 0:
            d = pyr_down_gauss_depth(d)
            g = pyr_down_uchar_gauss(g)
            m = pyr_down_mask_nearest(m)
        vmap = create_vmap(d, intr.level(i), depth_cutoff)
        nmap = create_nmap(vmap)
        levels.append(
            dict(depth=d, intensity=g, mask=m, vmap=vmap, nmap=nmap)
        )
    return tuple(levels)
