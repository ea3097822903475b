"""Co-Fusion motion segmentation (-method cofusion).

Re-implementation of Core/Segmentation/CfSegmentation.cpp: SLIC superpixels
(16 px) -> per-superpixel unaries from each model's alignment error and
prediction confidence (:108-228) -> fully-connected CRF with Potts
smoothness + appearance(x, y, RGB, depth) kernels (:366-401) -> argmax ->
connected components with keep-largest / size suppression (:414-498).

TPU-native twist: at superpixel resolution (40x30 = 1200 nodes) the dense
pairwise kernel fits trivially, so mean-field runs EXACT on the MXU — no
permutohedral-lattice approximation needed (the reference's DenseCRF exists
only because CPU inference can't afford the dense kernel)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from maskfusion_tpu.config import Config
from maskfusion_tpu.frame import FrameData
from maskfusion_tpu.ops import slic as slic_ops
from maskfusion_tpu.segmentation import components as cc
from maskfusion_tpu.segmentation.result import ModelData, SegmentationResult

MAX_DEPTH = 100.0


def dense_crf_meanfield(
    unary: jnp.ndarray,       # (L, N) energies (higher = worse)
    feats_app: jnp.ndarray,   # (N, F) appearance features
    feats_pos: jnp.ndarray,   # (N, 2) smoothness features
    weight_appearance: float = 40.0,
    weight_smoothness: float = 3.0,
    iterations: int = 10,
) -> jnp.ndarray:
    """Exact dense mean-field with Potts compatibility.  Kernel matrices are
    (N, N) — MXU matmuls at superpixel scale."""
    def kernel(feats):
        d2 = jnp.sum((feats[:, None, :] - feats[None, :, :]) ** 2, -1)
        k = jnp.exp(-0.5 * d2)
        return k - jnp.diag(jnp.diag(k))      # no self-potential

    k_app = kernel(feats_app)
    k_pos = kernel(feats_pos)
    q = jax.nn.softmax(-unary, axis=0)
    for _ in range(iterations):
        msg = (weight_appearance * (q @ k_app.T)
               + weight_smoothness * (q @ k_pos.T))
        # Potts: penalty for agreeing with OTHER labels' mass
        q = jax.nn.softmax(-unary - (msg.sum(axis=0, keepdims=True) - msg),
                           axis=0)
    return q


class CfSegmentation:
    # the engine builds per-model alignment-error/conf views for the CRF
    # unaries (engine._cf_model_views); without them the projected-id
    # fallback below cannot reach the new-label threshold
    wants_model_views = True

    def __init__(self, config: Config, resolution, intrinsics):
        self.cfg = config
        self.res = resolution
        self.spacing = 16
        # reference defaults (CfSegmentation.h:29-42)
        self.crf_iterations = 10
        self.unary_threshold_new = 5.0
        self.unary_k_error = 0.01
        self.unary_weight_error = 40.0
        self.weight_appearance = 40.0
        self.weight_smoothness = 3.0
        self.scale_pos = 0.1
        self.scale_rgb = 1.0 / 30.0
        self.scale_depth = 1.0
        self.min_segment_size = 50   # suppression on the low grid scale

    def perform(
        self,
        frame: FrameData,
        vmap,
        nmap,
        projected_ids: np.ndarray,
        models: Sequence,
        next_model_id: int,
        allow_new: bool,
        model_views: Optional[Sequence[dict]] = None,
    ) -> SegmentationResult:
        """`model_views`: per model, dict with 'error' (H, W alignment error)
        and 'conf' (H, W prediction confidence); when absent they are
        derived from the projected-id map (prediction coverage) — the
        engine passes real per-model views when available."""
        H, W = frame.depth.shape
        depth = jnp.asarray(frame.depth)
        if depth.dtype == jnp.uint16:   # raw sensor millimetres
            depth = depth.astype(jnp.float32) * jnp.float32(1e-3)
        rgbj = jnp.asarray(frame.rgb)
        n_models = len(models)
        n_labels = n_models + (1 if allow_new else 0)

        s = slic_ops.slic(rgbj, spacing=self.spacing)
        gh, gw = s.grid_hw
        n_spx = gh * gw

        low_depth = slic_ops.downsample(depth, s.labels, n_spx)
        depth_np = np.asarray(low_depth)
        finite = depth_np[(depth_np > 0) & np.isfinite(depth_np)]
        depth_range = float(finite.max() - finite.min()) if len(finite) else 1.0
        depth_range = max(depth_range, 1e-3)

        # --- unaries (CfSegmentation.cpp:168-222) ---
        unary = np.zeros((n_labels, n_spx), np.float32)
        for i, model in enumerate(models):
            if model_views is not None and i < len(model_views):
                err = np.asarray(slic_ops.downsample(
                    jnp.asarray(model_views[i]["error"]), s.labels, n_spx))
                conf = np.asarray(slic_ops.downsample(
                    jnp.asarray(model_views[i]["conf"]), s.labels, n_spx))
            else:
                owned = (projected_ids ==
                         getattr(model, "model_id", 0)).astype(np.float32)
                conf = np.asarray(slic_ops.downsample(
                    jnp.asarray(owned), s.labels, n_spx))
                err = (1.0 - conf) * depth_range * 0.05
            err = np.nan_to_num(err, nan=depth_range)
            conf = np.nan_to_num(conf, nan=0.0)
            if i == 0:
                # the global model is the DEFAULT owner: unexplored pixels
                # (no prediction yet) are cheap for it, so fresh territory
                # maps into the background rather than spawning
                err = np.where(conf < 0.3, depth_range * 0.01, err)
            else:
                # An object label has evidence only where it predicts.  A
                # FLAT cheap fallback (0.01*range -> unary 0.4) undercuts
                # the global model's residual noise and the object label
                # floods the frame (measured: one spawned model claiming
                # 86% of the VGA parity image); a flat expensive one
                # (0.5*range) starves the label of the band its stale
                # prediction lags behind and object tracking collapses
                # (measured: IoU 0.24 -> 0.017).  Distance falloff instead
                # (the reference shapes its unaries with a per-model
                # falloff, CfSegmentation.cpp:168-222): within ~3
                # superpixels of the prediction the label may reclaim its
                # own motion-lag band cheaply; far away it is priced out.
                on = (conf > 0.4).reshape(gh, gw)
                from scipy import ndimage
                near = ndimage.binary_dilation(on, iterations=3).reshape(-1)
                err = np.where(conf > 0.4, err,
                               np.where(near, depth_range * 0.05,
                                        depth_range * 0.5))
            unary[i] = self.unary_weight_error * (err / depth_range)

        if allow_new:
            lowest = unary[:n_models].min(axis=0) / max(
                self.unary_weight_error, 1e-6)
            unary[n_models] = np.maximum(
                self.unary_threshold_new
                - self.unary_weight_error * lowest, 0.01)

        # --- exact dense CRF on superpixels (:366-401) ---
        feats_app = np.concatenate([
            np.asarray(s.mean_pos) * self.scale_pos,
            np.asarray(s.mean_rgb) * self.scale_rgb,
            np.clip(depth_np, 0, MAX_DEPTH)[:, None] * self.scale_depth,
        ], axis=1)
        feats_pos = np.asarray(s.mean_pos) / 2.0   # sigma 2 on the grid
        q = dense_crf_meanfield(
            jnp.asarray(unary), jnp.asarray(feats_app),
            jnp.asarray(feats_pos),
            self.weight_appearance, self.weight_smoothness,
            self.crf_iterations,
        )
        low_labels = np.asarray(jnp.argmax(q, axis=0)).astype(np.int32)

        # --- upsample + post-processing (:414-498) ---
        label_ids = [getattr(m, "model_id", 0) for m in models]
        if allow_new:
            label_ids.append(next_model_id)
        pixel_lab = low_labels[np.asarray(s.labels)]

        result = SegmentationResult(
            full_segmentation=np.zeros((H, W), np.uint8))
        for m in models:
            result.model_data.append(
                ModelData(getattr(m, "model_id", 0),
                          class_id=getattr(m, "class_id", -1)))

        seg = np.zeros((H, W), np.uint8)
        has_new = False
        for li in range(1, n_labels):
            sel = pixel_lab == li
            if not sel.any():
                continue
            comp = cc.connected_components(sel)
            if comp.count <= 1:
                continue
            largest = int(np.argmax(comp.sizes[1:])) + 1
            keep = comp.labels == largest   # keep-largest (:414-498)
            if keep.sum() < max(self.min_segment_size, 0.003 * H * W):
                continue
            # border suppression: components hugging the frame border are
            # unreliable (:475-489)
            ys, xs = np.where(keep)
            border_frac = (
                ((ys < 2) | (ys >= H - 2) | (xs < 2) | (xs >= W - 2)).mean())
            if border_frac > 0.2:
                continue
            mid = label_ids[li]
            if li == n_models:   # the "new label" slot
                rel = keep.sum() / (H * W)
                if not (self.cfg.seg_min_new_rel < rel
                        < self.cfg.seg_max_new_rel) or has_new:
                    continue
                has_new = True
                result.has_new_label = True
                result.model_data.append(ModelData(
                    next_model_id, is_empty=False,
                    pixel_count=int(keep.sum())))
            seg[keep] = mid

        result.full_segmentation = seg
        d = frame.host_depth()
        for md in result.model_data:
            selm = (seg == md.model_id) & (d > 0)
            if selm.any():
                md.is_empty = False
                md.pixel_count = int(selm.sum())
                md.depth_mean = float(d[selm].mean())
                md.depth_std = float(d[selm].std())
        return result
