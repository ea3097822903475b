"""Headless visualisation.

Equivalent of the reference's Pangolin GUI rendering (GUI/Tools/GUI.h,
MainController::drawScene, draw_global_surface.vert/frag+phong, FXAA,
texture viewports) re-targeted at offscreen images: the surfel splatting
pipeline renders the map from any viewpoint, a Phong shading pass replaces
the GLSL lighting, and the texture panels (predicted RGB / normals /
normalised depth / labels) are composited into one viewport image
(-ev export)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from maskfusion_tpu import se3
from maskfusion_tpu.camera import CameraIntrinsics
from maskfusion_tpu.io.export import export_label_image  # noqa: F401 (re-export)
from maskfusion_tpu.mapping import surfel_map as sm
from maskfusion_tpu.ops import splat as splat_ops

LABEL_COLORS = np.array(
    [[0, 0, 0], [0, 0, 255], [255, 0, 0], [0, 255, 0], [255, 26, 184],
     [255, 211, 0], [0, 131, 246], [0, 140, 70], [167, 96, 61],
     [79, 0, 105], [0, 255, 246], [61, 123, 140], [237, 167, 255],
     [211, 255, 149], [184, 79, 255], [228, 26, 87], [131, 131, 0],
     [0, 255, 149], [96, 0, 43], [246, 131, 17], [202, 255, 0],
     [43, 61, 0], [0, 52, 193], [255, 202, 131], [0, 43, 96],
     [158, 114, 140], [79, 184, 17], [158, 193, 255], [149, 158, 123],
     [255, 123, 175], [158, 8, 0]], np.uint8)


def render_map_view(
    surfel_map: sm.SurfelMap,
    view_pose: np.ndarray,
    intr: CameraIntrinsics,
    width: int,
    height: int,
    max_depth: float = 12.0,
    shaded: bool = True,
    light_dir=(0.3, -0.4, -0.85),
):
    """Render the surfel map from `view_pose` (cam->world).

    Returns dict with 'rgb' (shaded or albedo), 'depth', 'normal'.  Phong
    term mirrors draw_global_surface.frag's headlight shading."""
    im = splat_ops.render_index_map(
        surfel_map, jnp.asarray(np.linalg.inv(view_pose).astype(np.float32)),
        intr, height, width, time=jnp.inf, time_delta=jnp.inf,
        max_depth=max_depth,
    )
    pred = splat_ops.combined_predict(im, intr, max_depth)
    rgb = np.asarray(pred.rgb)
    nrm = np.nan_to_num(np.asarray(pred.nmap), nan=0.0)
    depth = np.asarray(pred.depth)
    if shaded:
        l = np.asarray(light_dir, np.float64)
        l /= np.linalg.norm(l)
        lambert = np.clip(-(nrm @ l), 0.15, 1.0)
        rgb = rgb * lambert[..., None]
    out_rgb = np.clip(rgb, 0, 255).astype(np.uint8)
    return {"rgb": out_rgb, "depth": depth, "normal": nrm}


def normalise_depth(depth: np.ndarray, min_val: float = 0.3,
                    max_val: float = 5.0) -> np.ndarray:
    """Depth -> grayscale (ref depth_norm.frag)."""
    d = np.clip((depth - min_val) / max(max_val - min_val, 1e-6), 0, 1)
    d = np.where(depth > 0, d, 0.0)
    return (d * 255).astype(np.uint8)


def colorise_labels(seg: np.ndarray) -> np.ndarray:
    """(ref int_to_color.frag + color_table.glsl)."""
    vis = LABEL_COLORS[seg % 31]
    vis[seg == 255] = 255
    return vis


def viewport(engine, width: Optional[int] = None,
             height: Optional[int] = None) -> np.ndarray:
    """2x2 panel: predicted RGB | shaded map | normalised depth | labels —
    the headless stand-in for the GUI's texture viewport columns
    (GUI.h:312-339)."""
    glob = engine.models[0]
    H, W = np.asarray(glob.state.pred_rgb).shape[:2]
    rgb = np.clip(np.asarray(glob.state.pred_rgb), 0, 255).astype(np.uint8)
    view = render_map_view(
        glob.state.map, np.asarray(glob.state.pose), engine.intr, W, H,
        max_depth=engine.cfg.depth_cutoff,
    )
    depth_vis = np.repeat(
        normalise_depth(view["depth"], 0.3, engine.cfg.depth_cutoff)[..., None],
        3, axis=-1)
    seg = (engine.last_segmentation
           if engine.last_segmentation is not None
           else np.zeros((H, W), np.uint8))
    labels = colorise_labels(seg)
    top = np.concatenate([rgb, view["rgb"]], axis=1)
    bottom = np.concatenate([depth_vis, labels], axis=1)
    panel = np.concatenate([top, bottom], axis=0)
    if width and height:
        import cv2

        panel = cv2.resize(panel, (width, height))
    return panel


def save_viewport(engine, path: str):
    import cv2

    cv2.imwrite(path, cv2.cvtColor(viewport(engine), cv2.COLOR_RGB2BGR))
    return path
