"""Synthetic RGB-D scene renderer for golden tests.

Generates a dense textured wavy-surface point cloud in world coordinates and
z-buffer renders it from arbitrary camera poses — the oracle for tracking,
fusion, and segmentation tests (the reference project has no tests; SURVEY.md
§4 motivates dataset-free synthetic goldens)."""

from __future__ import annotations

import numpy as np

from maskfusion_tpu.camera import CameraIntrinsics


DEFAULT_INTR = CameraIntrinsics(fx=130.0, fy=130.0, cx=80.0, cy=60.0)
W, H = 160, 120


def make_scene(n_u=700, n_v=560, seed=0):
    """Dense textured wavy surface ~2 m in front of the origin."""
    x = np.linspace(-1.6, 1.6, n_u)
    y = np.linspace(-1.3, 1.3, n_v)
    X, Y = np.meshgrid(x, y)
    Z = 2.0 + 0.25 * np.sin(2.2 * X) + 0.18 * np.cos(3.1 * Y) + 0.05 * np.sin(7 * X * Y)
    pts = np.stack([X, Y, Z], -1).reshape(-1, 3)
    # high-contrast texture keyed to world position; the high-frequency terms
    # give gradients strong enough to pass the reference's minGradMagnitude
    # gate (5 levels/px at level 0, RGBDOdometry.cpp:102-105)
    r = 127.5 + 60 * np.sin(4.0 * X) * np.cos(3.0 * Y) + 60 * np.sin(45.0 * X)
    g = 127.5 + 60 * np.sin(2.5 * X + 1.0) + 60 * np.cos(38.0 * Y)
    b = 127.5 + 60 * np.cos(3.5 * Y + 0.5) + 60 * np.sin(30.0 * (X + Y))
    cols = np.stack([r, g, b], -1).reshape(-1, 3).clip(0, 255).astype(np.uint8)
    return pts.astype(np.float32), cols


def make_scene_with_object(offset=np.zeros(3), seed=0):
    """Wavy background + a textured box 'object' that can be displaced.
    Returns (points, colors, labels) with label 1 on the object."""
    pts_bg, cols_bg = make_scene(seed=seed)
    # curved object face at z ~1.5, 0.56x0.42 m (~50x36 px at 160x120 —
    # comparable relative size to a household object at 640x480)
    n = 320
    x = np.linspace(-0.28, 0.28, n)
    y = np.linspace(-0.21, 0.21, int(n * 0.75))
    X, Y = np.meshgrid(x, y)
    Z = 1.5 + 0.10 * np.sin(4.5 * X) + 0.08 * np.cos(5.5 * Y)
    pts_obj = np.stack([X + 0.1, Y - 0.05, Z], -1).reshape(-1, 3).astype(np.float32)
    pts_obj = pts_obj + offset.astype(np.float32)
    r = 127.5 + 110 * np.sin(17 * X)
    g = 127.5 + 110 * np.cos(13 * Y)
    b = np.full_like(r, 60.0)
    cols_obj = np.stack([r, g, b], -1).reshape(-1, 3).clip(0, 255).astype(np.uint8)
    pts = np.concatenate([pts_bg, pts_obj])
    cols = np.concatenate([cols_bg, cols_obj])
    labels = np.concatenate(
        [np.zeros(len(pts_bg), np.uint8), np.ones(len(pts_obj), np.uint8)]
    )
    return pts, cols, labels


def render(pts_w, cols, pose_c2w, intr=DEFAULT_INTR, w=W, h=H, labels=None):
    """Z-buffer point render. Returns (rgb uint8 (h,w,3), depth float32 (h,w),
    [label uint8 (h,w)]) with depth 0 where nothing projects."""
    T = np.asarray(pose_c2w, np.float64)
    R = T[:3, :3]
    t = T[:3, 3]
    p_cam = (pts_w - t) @ R  # R^T @ (p - t)
    z = p_cam[:, 2]
    front = z > 0.05
    uf = p_cam[:, 0] * intr.fx / z + intr.cx
    vf = p_cam[:, 1] * intr.fy / z + intr.cy
    u = np.round(uf).astype(np.int64)
    v = np.round(vf).astype(np.int64)
    ok = front & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    lin = v[ok] * w + u[ok]
    zok = z[ok].astype(np.float32)

    zbuf = np.full(h * w, np.inf, np.float32)
    np.minimum.at(zbuf, lin, zok)
    # among points on the front surface of each pixel (within 0.5% of the
    # z-winner), keep the one whose true projection is CLOSEST to the pixel
    # centre — a real sensor measures through the centre ray, and with ~20
    # points/pixel this cuts the lateral aliasing from 0.5 px to ~0.1 px
    # (raw-depth fusion, data.vert:85-90, needs centre-accurate raw depth)
    near_front = zok <= zbuf[lin] * (1 + 5e-3)
    du = uf[ok] - np.round(uf[ok])
    dv = vf[ok] - np.round(vf[ok])
    centre_dist = (du * du + dv * dv).astype(np.float32)
    dist_key = np.where(near_front, centre_dist, np.inf)
    best = np.full(h * w, np.inf, np.float32)
    np.minimum.at(best, lin, dist_key)
    winner = near_front & (dist_key <= best[lin])

    rgb = np.zeros((h * w, 3), np.uint8)
    rgb[lin[winner]] = cols[ok][winner]
    depth = np.zeros(h * w, np.float32)
    depth[lin[winner]] = zok[winner]
    out = [rgb.reshape(h, w, 3), depth.reshape(h, w)]
    if labels is not None:
        lab = np.zeros(h * w, np.uint8)
        lab[lin[winner]] = labels[ok][winner]
        out.append(lab.reshape(h, w))
    return tuple(out)


def pose_from(rvec, tvec):
    """Small-angle helper building a cam->world pose."""
    from scipy.spatial.transform import Rotation

    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Rotation.from_rotvec(rvec).as_matrix().astype(np.float32)
    T[:3, 3] = np.asarray(tvec, np.float32)
    return T


def rotation_angle_deg(Ra, Rb):
    ctheta = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(ctheta, -1, 1)))


def make_scene_with_two_objects(off1=np.zeros(3), off2=np.zeros(3), seed=0):
    """Wavy background + two displaced textured patches (labels 1 and 2)."""
    pts_bg, cols_bg = make_scene(seed=seed)

    def patch(cx, cy, phase, off):
        n = 320
        x = np.linspace(-0.26, 0.26, n)
        y = np.linspace(-0.20, 0.20, int(n * 0.75))
        X, Y = np.meshgrid(x, y)
        Z = 1.5 + 0.10 * np.sin(4.5 * X + phase) + 0.08 * np.cos(5.5 * Y)
        p = np.stack([X + cx, Y + cy, Z], -1).reshape(-1, 3).astype(np.float32)
        p = p + off.astype(np.float32)
        r = 127.5 + 110 * np.sin(15 * X + phase)
        g = 127.5 + 110 * np.cos(11 * Y)
        b = np.full_like(r, 90.0)
        c = np.stack([r, g, b], -1).reshape(-1, 3).clip(0, 255).astype(np.uint8)
        return p, c

    p1, c1 = patch(-0.34, -0.05, 0.0, off1)
    p2, c2 = patch(0.38, 0.02, 1.3, off2)
    pts = np.concatenate([pts_bg, p1, p2])
    cols = np.concatenate([cols_bg, c1, c2])
    labels = np.concatenate([
        np.zeros(len(pts_bg), np.uint8),
        np.full(len(p1), 1, np.uint8),
        np.full(len(p2), 2, np.uint8),
    ])
    return pts, cols, labels
