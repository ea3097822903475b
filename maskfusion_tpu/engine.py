"""The MaskFusion engine: per-frame SLAM pipeline.

TPU-native equivalent of Core/MaskFusion.{h,cpp} — the orchestration of
preprocess -> track -> segment -> fuse -> clean -> predict
(MaskFusion::processFrame, MaskFusion.cpp:200-607).

Architecture: all dense per-frame work happens inside ONE jitted step
function per model-set ( `_static_step` for -static mode; the multi-model
path batches models with vmap).  Host code only streams frames, runs the
(cheap) segmentation label logic, manages model lifecycle, and logs poses.
The surfel maps live in device HBM across frames; step functions donate the
state so XLA updates buffers in place.
"""

from __future__ import annotations

import dataclasses
import functools
import time as _time
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from maskfusion_tpu import se3
from maskfusion_tpu.camera import CameraIntrinsics, Resolution
from maskfusion_tpu.config import Config
from maskfusion_tpu.frame import FrameData
from maskfusion_tpu.mapping import surfel_map as sm
from maskfusion_tpu.mapping.surfel_map import SurfelMap
from maskfusion_tpu.ops import clean as clean_ops
from maskfusion_tpu.ops import fill_in as fill_ops
from maskfusion_tpu.ops import fuse as fuse_ops
from maskfusion_tpu.ops import preprocess as pp
from maskfusion_tpu.ops import splat as splat_ops
from maskfusion_tpu.tracking import odometry as odo
from maskfusion_tpu.utils.stopwatch import Stopwatch


class ModelState(NamedTuple):
    """One surfel model + pose track + the prediction used for tracking."""
    map: SurfelMap
    pose: jnp.ndarray          # (4,4) cam->world (for objects: model pose)
    last_delta: jnp.ndarray    # (4,4) last frame's motion (fusion weight)
    pred_vmap: jnp.ndarray     # filled prediction (camera frame @ pose)
    pred_nmap: jnp.ndarray
    pred_rgb: jnp.ndarray      # float32
    so3_intensity: jnp.ndarray  # coarsest-level intensity of previous frame


class StepDiagnostics(NamedTuple):
    icp_error: jnp.ndarray
    icp_count: jnp.ndarray
    rgb_error: jnp.ndarray
    rgb_count: jnp.ndarray
    covariance_diag: jnp.ndarray   # (6,)
    surfel_count: jnp.ndarray
    removed: jnp.ndarray


class Preprocessed(NamedTuple):
    filt_depth: jnp.ndarray
    intensity: jnp.ndarray
    levels: tuple
    frame_pyr: odo.FramePyramids


class MaskFusion:
    """Host-side engine.  Mirrors the public surface of the reference
    MaskFusion class (MaskFusion.h:45-425) in python-idiomatic form."""

    def __init__(self, resolution: Resolution, intr: CameraIntrinsics,
                 config: Optional[Config] = None):
        self.res = resolution
        self.intr = intr
        self.cfg = config or Config()
        self.tick = 0
        self.global_model: Optional[ModelState] = None
        self.pose_log: List[Dict] = []       # per-frame camera poses
        self.stopwatch = Stopwatch()
        self._build_jits()

    # ------------------------------------------------------------------ jit
    def _build_jits(self):
        cfg = self.cfg
        intr = self.intr
        H, W = self.res.height, self.res.width

        @jax.jit
        def preprocess(rgb, depth, mask):
            filt = pp.bilateral_filter_depth(
                depth, radius=cfg.bilateral_radius
            )
            gray = pp.rgb_to_intensity(rgb)
            levels = pp.build_frame_pyramids(
                filt, gray, mask, intr, cfg.depth_cutoff, cfg.num_pyr_levels
            )
            frame_pyr = odo.build_frame_pyramids_for_odometry(
                levels, rgb, cfg.max_depth_rgb
            )
            return Preprocessed(filt, gray, levels, frame_pyr)

        self._preprocess = preprocess

        def init_model(prep: Preprocessed, rgb, mask, mask_id, pose, time,
                       capacity):
            vmap_raw = pp.create_vmap(
                prep.frame_pyr.depths[0], intr, cfg.depth_cutoff
            )
            vmap_raw = jnp.where(
                jnp.isfinite(prep.frame_pyr.depths[0])[..., None],
                vmap_raw, jnp.nan,
            )
            m = sm.init_from_frame(
                capacity,
                prep.levels[0]["vmap"],   # raw == filtered at init in ref
                prep.levels[0]["vmap"],
                prep.levels[0]["nmap"],
                rgb, mask, mask_id, pose, intr, time,
            )
            im = splat_ops.render_index_map(
                m, se3.pose_inverse(pose), intr, H, W, time,
                cfg.effective_time_delta(), cfg.depth_cutoff,
            )
            pred = splat_ops.combined_predict(im, intr, cfg.depth_cutoff)
            filled = fill_ops.fill_in(
                pred, rgb, prep.levels[0]["vmap"], prep.levels[0]["nmap"]
            )
            return ModelState(
                map=m, pose=pose, last_delta=jnp.eye(4),
                pred_vmap=filled.vmap, pred_nmap=filled.nmap,
                pred_rgb=filled.rgb,
                so3_intensity=prep.frame_pyr.intensities[cfg.num_pyr_levels - 1],
            )

        self._init_model = jax.jit(init_model, static_argnames=("capacity",))

        def static_step(state: ModelState, prep: Preprocessed, rgb, mask,
                        time):
            """Full frame step for -static single-model mode: track against
            the model prediction, fuse, clean, predict."""
            time_delta = cfg.effective_time_delta()
            mask_id = jnp.uint8(0)

            # ---- track (Model::performTracking, Model.cpp:427-447) ----
            model_pyr = odo.build_model_pyramids(
                state.pred_vmap, state.pred_nmap, state.pred_rgb,
                state.pose, cfg.num_pyr_levels, cfg.max_depth_rgb,
            )
            so3_pyr = [None] * cfg.num_pyr_levels
            so3_pyr[cfg.num_pyr_levels - 1] = state.so3_intensity
            res = odo.get_incremental_transformation(
                state.pose[:3, 3], state.pose[:3, :3],
                prep.frame_pyr, model_pyr, tuple(so3_pyr), intr,
                rgb_only=cfg.rgb_only, icp_weight=cfg.icp_weight,
                pyramid=cfg.pyramid, fast_odom=cfg.fast_odom,
                use_so3=cfg.use_so3, mask_id=mask_id,
                use_mask_rgb=cfg.mask_rgb_residual,
                use_mask_icp=cfg.mask_icp_residual,
                dist_thresh=cfg.dist_threshold,
                angle_thresh_sine=cfg.angle_threshold_sine,
                max_depth_delta_rgb=cfg.max_depth_delta_rgb,
                sobel_scale=cfg.sobel_scale,
                min_grad_magnitudes=cfg.min_grad_magnitudes,
                translation_jump_limit=cfg.translation_jump_limit,
                num_levels=cfg.num_pyr_levels,
            )
            pose = se3.make_pose(res.R, res.t)
            pose_inv = se3.pose_inverse(pose)

            # ---- fuse (predictIndices -> fuse -> predictIndices -> clean,
            #      MaskFusion.cpp:539-565) ----
            weighting = fuse_ops.compute_fusion_weight(
                state.last_delta, cfg.weight_multiplier
            )
            im1 = splat_ops.render_index_map(
                state.map, pose_inv, intr, H, W, time, time_delta,
                cfg.depth_cutoff,
            )
            fres = fuse_ops.fuse(
                state.map, im1,
                prep.levels[0]["vmap"],
                prep.levels[0]["vmap"], prep.levels[0]["nmap"],
                rgb, mask, mask_id, pose, intr, time, weighting,
                cfg.depth_cutoff,
                checkerboard=cfg.fuse_subsample_checkerboard,
                merge_z_thresh=cfg.surfel_merge_z_thresh,
            )
            im2 = splat_ops.render_index_map(
                fres.map, pose_inv, intr, H, W, time, time_delta,
                cfg.depth_cutoff,
            )
            cres = clean_ops.clean(
                fres.map, im2, prep.filt_depth, mask, mask_id, pose_inv,
                intr, time, time_delta, cfg.conf_threshold_global,
                cfg.depth_cutoff, cfg.outlier_coefficient,
                unstable_time_limit=cfg.unstable_time_limit,
            )

            # ---- predict for next frame (MaskFusion::predict, :616-628) ----
            im3 = splat_ops.render_index_map(
                cres.map, pose_inv, intr, H, W, time, time_delta,
                cfg.depth_cutoff,
            )
            pred = splat_ops.combined_predict(im3, intr, cfg.depth_cutoff)
            filled = fill_ops.fill_in(
                pred, rgb, prep.levels[0]["vmap"], prep.levels[0]["nmap"]
            )

            # last frame's relative motion, for the velocity fusion weight
            delta = pose_inv @ state.pose
            new_state = ModelState(
                map=cres.map, pose=pose, last_delta=delta,
                pred_vmap=filled.vmap, pred_nmap=filled.nmap,
                pred_rgb=filled.rgb,
                so3_intensity=prep.frame_pyr.intensities[cfg.num_pyr_levels - 1],
            )
            diag = StepDiagnostics(
                icp_error=res.icp_error, icp_count=res.icp_count,
                rgb_error=res.rgb_error, rgb_count=res.rgb_count,
                covariance_diag=jnp.diag(odo.covariance(res.A)),
                surfel_count=cres.map.count, removed=cres.removed,
            )
            return new_state, diag

        self._static_step = jax.jit(static_step, donate_argnums=(0,))

    # ------------------------------------------------------------ frame API
    def process_frame(self, frame: FrameData,
                      gt_pose: Optional[np.ndarray] = None) -> Dict:
        """Equivalent of MaskFusion::processFrame (MaskFusion.cpp:200-607),
        static-mode path.  Returns diagnostics for the frame."""
        self.tick += 1
        t0 = _time.perf_counter()
        rgb = jnp.asarray(frame.rgb)
        depth = jnp.asarray(frame.depth.astype(np.float32))
        mask = jnp.asarray(
            frame.mask if frame.mask is not None
            else np.zeros(frame.depth.shape, np.uint8)
        )

        with self.stopwatch.scope("Preprocess"):
            prep = self._preprocess(rgb, depth, mask)

        if self.global_model is None:
            pose0 = jnp.asarray(
                gt_pose if gt_pose is not None else np.eye(4, dtype=np.float32)
            )
            self.global_model = self._init_model(
                prep, rgb, mask, jnp.uint8(0), pose0,
                float(self.tick), self.cfg.global_surfel_capacity,
            )
            diag_out = {
                "tick": self.tick, "surfels": int(self.global_model.map.count),
                "icp_error": 0.0, "tracking_ok": True,
            }
        else:
            with self.stopwatch.scope("Run"):
                self.global_model, diag = self._static_step(
                    self.global_model, prep, rgb, mask, float(self.tick)
                )
            if gt_pose is not None:
                # -p flag: override pose with ground truth
                # (MainController.cpp:458-462)
                self.global_model = self.global_model._replace(
                    pose=jnp.asarray(gt_pose.astype(np.float32))
                )
            cov_ok = bool(np.asarray(diag.covariance_diag).max() <= 1e-4)
            diag_out = {
                "tick": self.tick,
                "surfels": int(diag.surfel_count),
                "icp_error": float(diag.icp_error),
                "icp_count": float(diag.icp_count),
                "rgb_count": float(diag.rgb_count),
                "removed": int(diag.removed),
                "tracking_ok": cov_ok,
            }

        self.pose_log.append({
            "timestamp": frame.timestamp or float(self.tick),
            "pose": np.asarray(self.global_model.pose),
        })
        self.stopwatch.record("Frame", (_time.perf_counter() - t0) * 1000)
        return diag_out

    # ------------------------------------------------------------- exports
    @property
    def current_pose(self) -> np.ndarray:
        return np.asarray(self.global_model.pose)

    def download_map(self):
        return sm.download(self.global_model.map)
