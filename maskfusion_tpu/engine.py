"""The MaskFusion engine: per-frame object-aware SLAM pipeline.

TPU-native equivalent of Core/MaskFusion.{h,cpp} — the orchestration of
preprocess -> track (all models) -> global projection -> segment ->
spawn/deactivate -> fuse -> clean -> predict
(MaskFusion::processFrame, MaskFusion.cpp:200-607).

Architecture: the dense per-frame work is grouped into a small number of
jitted stages (preprocess / track / fuse+clean+predict / project) whose
shapes depend only on (resolution, surfel capacity), so there is one compile
per model class (global vs object).  Surfel maps stay in device HBM across
frames with donated updates.  Host code streams frames, runs the cheap
segmentation label logic, and manages the model lifecycle.

Pose conventions (matching the reference exactly):
  - every model's `pose` is the camera pose in that model's frame
    (Model::performTracking, Model.cpp:427-447)
  - model 0:                cam->world = pose
  - object models:          obj->world = global_pose @ inverse(obj_pose)
    (pose logging, MaskFusion.cpp:578-588)
  - static objects mirror camera motion: pose = initial_c2w_inv @ global_pose
    (Model.h:263-268)
"""

from __future__ import annotations

import collections as _collections
import dataclasses
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
from maskfusion_tpu.ops import clean as clean_ops
from maskfusion_tpu.ops import fill_in as fill_ops
from maskfusion_tpu.ops import fuse as fuse_ops
from maskfusion_tpu.ops import preprocess as pp
from maskfusion_tpu.ops import splat as splat_ops
from maskfusion_tpu.segmentation import create_segmenter
from maskfusion_tpu.segmentation.mf_segmentation import ModelInfo
from maskfusion_tpu.tracking import odometry as odo
from maskfusion_tpu.utils.stopwatch import Stopwatch


# Dead padding-slot sentinel for the pipelined graphs' object axis: a
# mask_id no live model may hold (id assignment skips 254/255), so dead
# slots' fuse matches zero pixels and their lanes are select-sanitised
# inside the device stage.  255 stays the semantic-ignore label.
DEAD_SLOT_ID = 254


def _slot_class(n_live: int, floor: int) -> int:
    """Object-axis size class: next power of two >= max(n_live, floor).
    Returns 0 only when both are 0 (keeps the glob-only graph exact)."""
    n = max(n_live, floor)
    if n <= 0:
        return 0
    c = 1
    while c < n:
        c <<= 1
    return c


class MapState(NamedTuple):
    """Device-resident per-model state."""
    map: sm.SurfelMap
    pose: jnp.ndarray          # (4,4) camera pose in model frame
    last_delta: jnp.ndarray    # (4,4) last frame's motion (fusion weight)
    pred_vmap: jnp.ndarray     # filled prediction (camera frame)
    pred_nmap: jnp.ndarray
    pred_rgb: jnp.ndarray      # float32
    so3_intensity: jnp.ndarray  # coarsest-level intensity of previous frame


class TrackResult(NamedTuple):
    pose: jnp.ndarray
    delta: jnp.ndarray
    icp_error: jnp.ndarray
    icp_count: jnp.ndarray
    rgb_error: jnp.ndarray
    rgb_count: jnp.ndarray
    cov_diag: jnp.ndarray


class Preprocessed(NamedTuple):
    filt_depth: jnp.ndarray
    intensity: jnp.ndarray
    levels: tuple
    frame_pyr: odo.FramePyramids
    vmap_raw: jnp.ndarray      # vertices from RAW depth — fusion geometry
                               # source (data.vert:85-90: "Filtered position
                               # ONLY used for normal and radius")


@dataclasses.dataclass
class Model:
    """Host-side model record (the reference's Model bookkeeping fields,
    Model.h:240-320)."""
    model_id: int
    state: MapState
    class_id: int = -1
    age: int = 0
    unseen_count: int = 0
    is_static: bool = True
    initial_c2w_inv: Optional[np.ndarray] = None
    conf_threshold: float = 10.0
    max_depth: float = 100.0
    prev_pose: Optional[np.ndarray] = None
    pose_log: List = dataclasses.field(default_factory=list)
    last_bucket: int = 0      # shrink-hysteresis input for choose_bucket
    count_est: int = -1       # async-refreshed count (pipelined mode);
                              # -1 = unknown, fall back to a blocking fetch
    window: Optional[tuple] = None  # (oy, ox) object-window origin, or None
                                    # when the mask doesn't fit the window
    fused_once: bool = False  # first-fuse weight boost applied yet?  (age
                              # alone breaks under fuse_mask_lag: a spawned
                              # model's first fuse lands one frame later)

    @property
    def surfel_count(self) -> int:
        return int(self.state.map.count)


class MaskFusion:
    """Host-side engine mirroring the public surface of the reference
    MaskFusion class (MaskFusion.h:45-425)."""

    def __init__(self, resolution: Resolution, intr: CameraIntrinsics,
                 config: Optional[Config] = None, mesh=None,
                 model_axis: str = "models"):
        self.res = resolution
        self.intr = intr
        self.cfg = config or Config()
        # per-device-generation tuning (GPUConfig.h:50-146 analogue):
        # bucket floors/headroom + diagnostics cadence keyed on device kind
        from maskfusion_tpu.utils.tuning import get_tuning

        self._tuning = get_tuning()
        self.DIAG_INTERVAL = self._tuning.diag_interval
        # Multi-chip model-axis parallelism (replaces the reference's
        # sequential per-model loop, MaskFusion.cpp:246-278): with a
        # jax.sharding.Mesh, the object-stacked axis inside the pipelined
        # tracking/fuse graphs carries a GSPMD sharding constraint so each
        # device tracks+fuses its shard of the object models; the frame
        # pyramids replicate and collectives ride ICI.
        self._model_mesh = mesh
        self._model_axis = model_axis
        self.tick = 0
        self.models: List[Model] = []          # [0] = global model
        self.inactive_models: List[Model] = []
        self.next_id = 1
        self.spawn_offset = self.cfg.model_spawn_offset
        self.last_segmentation: Optional[np.ndarray] = None
        # last-dispatch arg shapes of the bucket-keyed frame graphs, for
        # prewarm_next_buckets (AOT-compile growth rungs out of live windows)
        self._prewarm_ex: dict = {}
        self.stopwatch = Stopwatch()
        self.lost = False
        self._last_count = 0
        # Bucket sizing on the static fast path works from a count ESTIMATE:
        # _last_count is refreshed only every DIAG_INTERVAL frames, so during
        # fast exploration the live count can outgrow the chosen bucket
        # between flushes.  Overflow is a SOFT failure (compact_into clamps;
        # the dropped new-unstables' pixels stay unmatched and re-append on
        # the next frame with room), so rather than sizing for the worst-case
        # append cap (76800/frame at VGA — that would balloon every bucket),
        # we extrapolate with the OBSERVED per-frame append rate from the
        # diagnostics and pump the bucket up a step when a flush shows the
        # count near the bucket ceiling.
        self._frames_since_flush = 0
        self._append_rate = 8192.0
        # tracking-failure covariance threshold: the GN covariance scales
        # ~1/pixel-count, so the VGA-calibrated bound is widened for
        # smaller resolutions (the reference only ever runs VGA/512x424)
        self._cov_thresh = 1e-4 * max(
            1.0, (640.0 * 480.0) / (resolution.width * resolution.height))
        self._last_tracking_ok = True
        self._pending_diag = None
        self.last_frame_recovery = False
        self.bad_tracking_streak = 0
        self.ferns = None
        if self.cfg.relocalisation or self.cfg.close_loops:
            from maskfusion_tpu.reloc.ferns import Ferns

            self.ferns = Ferns(
                self.cfg.num_ferns, resolution, intr,
                max_depth=self.cfg.depth_cutoff,
                photo_thresh=self.cfg.photometric_thresh,
                factor=1 << self.cfg.fern_pyramid_level,
            )
        self.new_model_listeners = []
        self.inactive_model_listeners = []
        self._pending = _collections.deque()  # in-flight pipelined frames
        self._uploader = None     # lazy single-thread frame-staging pool
        self._recent_spawns = []  # (expiry_tick, model_id, spawn mask) —
                                  # phantom re-spawn claims, see
                                  # _segment_and_update_models
        self._pipelined_active = False
        self._np_glob_pose = None   # numpy mirror of the tracked global
        self._seg_dev = None        # (tick, device seg) fuse-stage cache
        self._dummy_state_cache = {}  # capacity -> dead padding-slot state
        self._diag_exporter = None
        if self.cfg.diag_export_dir:
            from maskfusion_tpu.utils.diag_export import DiagnosticExporter

            self._diag_exporter = DiagnosticExporter(
                self.cfg.diag_export_dir,
                interval=self.cfg.diag_export_interval)
        self._matcher = None
        self.segmenter = None
        if not self.cfg.static_mode:
            self.segmenter = create_segmenter(
                self.cfg.seg_method, self.cfg, resolution, intr
            )
        self._build_jits()

    # ------------------------------------------------------------------ jit
    def _build_jits(self):
        cfg = self.cfg
        intr = self.intr
        H, W = self.res.height, self.res.width
        time_delta = cfg.effective_time_delta()

        from maskfusion_tpu.ops import dispatch, pallas_kernels

        # The reference's bilateral shader params are calibrated for VGA
        # (depth_bilateral_metric.frag runs at 640x480/512x424); keep the
        # METRIC footprint constant across resolutions by scaling the pixel
        # radius and spatial sigma with image width (no-op at W=640).
        _bl_scale = W / 640.0
        _bl_radius = max(1, int(round(cfg.bilateral_radius * _bl_scale)))
        _bl_sigma_space = 0.024691358 / (_bl_scale * _bl_scale)

        @jax.jit
        def preprocess(rgb, depth, prev_seg):
            # depth may arrive as RAW uint16 millimetres (the sensor wire
            # format, FrameData.h:25-48): converting on device halves the
            # depth upload bytes on remote transports.  dtype is static, so
            # this branch costs nothing and fuses into the bilateral pass.
            if depth.dtype == jnp.uint16:
                depth = depth.astype(jnp.float32) * jnp.float32(1e-3)
            # bilateral stays on the fused-XLA path: the 169-tap Pallas
            # variant blows up Mosaic compile time (see ops/pallas_kernels)
            filt = pp.bilateral_filter_depth(
                depth, radius=_bl_radius,
                sigma_space2_inv_half=_bl_sigma_space)
            gray = pp.rgb_to_intensity(rgb)
            levels = pp.build_frame_pyramids(
                filt, gray, prev_seg, intr, cfg.depth_cutoff,
                cfg.num_pyr_levels,
            )
            if cfg.icl_nuim:
                # -icl: ICL-NUIM's negative focal length flips normals
                # (MainController.cpp:-icl doc)
                levels = tuple(
                    dict(l, nmap=-l["nmap"]) for l in levels)
            frame_pyr = odo.build_frame_pyramids_for_odometry(
                levels, rgb, cfg.max_depth_rgb
            )
            vmap_raw = pp.create_vmap(depth, intr, cfg.depth_cutoff)
            return Preprocessed(filt, gray, levels, frame_pyr, vmap_raw)

        self._preprocess = preprocess

        def track(state: MapState, prep: Preprocessed, mask_id,
                  is_object: bool = False, warm=None):
            # warm: camera world-motion from the already-tracked global
            # model; objects start the GN from "world-static" (their
            # camera pose mirrors the global delta, Model.h:263-268's
            # makeStatic philosophy) instead of from last frame's pose —
            # the right prior in directions a small object cannot observe
            pose0 = state.pose if warm is None else state.pose @ warm
            model_pyr = odo.build_model_pyramids(
                state.pred_vmap, state.pred_nmap, state.pred_rgb,
                state.pose, cfg.num_pyr_levels, cfg.max_depth_rgb,
            )
            so3_pyr = [None] * cfg.num_pyr_levels
            so3_pyr[cfg.num_pyr_levels - 1] = state.so3_intensity
            res = odo.get_incremental_transformation(
                pose0[:3, 3], pose0[:3, :3],
                prep.frame_pyr, model_pyr, tuple(so3_pyr), intr,
                rgb_only=cfg.rgb_only,
                icp_weight=(cfg.object_icp_weight if is_object
                            else cfg.icp_weight),
                gn_damping=(cfg.object_gn_damping if is_object else 0.0),
                rgb_finest_only=(is_object and cfg.object_rgb_finest_only),
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
                assoc_period=cfg.assoc_period,
                gn_step_eps=cfg.gn_step_eps,
            )
            pose = se3.make_pose(res.R, res.t)
            return TrackResult(
                pose=pose, delta=res.delta,
                icp_error=res.icp_error, icp_count=res.icp_count,
                rgb_error=res.rgb_error, rgb_count=res.rgb_count,
                cov_diag=jnp.diag(odo.covariance(res.A)),
            )

        self._track = jax.jit(track, static_argnames=("is_object",))

        def track_objects(poses, pvs, pns, pcs, so3s, mask_ids,
                          prep: Preprocessed, warm=None):
            """All object models in ONE vmapped dispatch (the reference
            tracks sequentially, MaskFusion.cpp:246-278; per-dispatch
            overhead makes the host loop cost ~5 ms per live object)."""

            def one(pose, pv, pn, pc, so3i, mid):
                model_pyr = odo.build_model_pyramids(
                    pv, pn, pc, pose, cfg.num_pyr_levels, cfg.max_depth_rgb)
                pose0 = pose if warm is None else pose @ warm
                so3_pyr = [None] * (cfg.num_pyr_levels - 1) + [so3i]
                res = odo.get_incremental_transformation(
                    pose0[:3, 3], pose0[:3, :3],
                    prep.frame_pyr, model_pyr, tuple(so3_pyr), intr,
                    rgb_only=cfg.rgb_only,
                    icp_weight=cfg.object_icp_weight,
                    gn_damping=cfg.object_gn_damping,
                    rgb_finest_only=cfg.object_rgb_finest_only,
                    pyramid=cfg.pyramid, fast_odom=cfg.fast_odom,
                    use_so3=cfg.use_so3, mask_id=mid,
                    use_mask_rgb=cfg.mask_rgb_residual,
                    use_mask_icp=cfg.mask_icp_residual,
                    dist_thresh=cfg.dist_threshold,
                    angle_thresh_sine=cfg.angle_threshold_sine,
                    max_depth_delta_rgb=cfg.max_depth_delta_rgb,
                    sobel_scale=cfg.sobel_scale,
                    min_grad_magnitudes=cfg.min_grad_magnitudes,
                    translation_jump_limit=cfg.translation_jump_limit,
                    num_levels=cfg.num_pyr_levels,
                    assoc_period=cfg.assoc_period,
                    gn_step_eps=cfg.gn_step_eps,
                )
                pose_new = se3.make_pose(res.R, res.t)
                return pose_new, jnp.linalg.norm(res.delta[:3, 3])

            return jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0))(
                poses, pvs, pns, pcs, so3s, mask_ids)

        self._track_objects = jax.jit(track_objects)

        def track_objects_win(poses, pvs, pns, pcs, so3s, mask_ids,
                              oys, oxs, prep: Preprocessed, warm=None):
            """Windowed object tracking: each object's GN runs on its
            static (OW, OW) crop of both pyramid sides with principal-
            point-shifted intrinsics — the object's model prediction is
            NaN outside its window (windowed predict), so the ICP terms
            (which iterate model pixels, icpStep reduce.cu:200-316) see
            the same associations as the full-frame solve, and the RGB
            terms are mask-gated (reduce.cu:836) to pixels inside the
            window.  Model pixels whose projection leaves the window
            (object moved further than object_window_margin in one frame)
            drop out of the solve — a documented deviation from the
            full-frame reference path (RGBDOdometry.cpp:153-185)."""
            fp = prep.frame_pyr
            L = cfg.num_pyr_levels

            def one(pose, pv, pn, pc, so3i, mid, oy, ox):
                z0 = jnp.int32(0)

                def c2(a, lv):
                    return jax.lax.dynamic_slice(
                        a, (oy >> lv, ox >> lv), (OW >> lv, OW >> lv))

                def c3(a, lv):
                    return jax.lax.dynamic_slice(
                        a, (oy >> lv, ox >> lv, z0),
                        (OW >> lv, OW >> lv, a.shape[2]))

                fpc = odo.FramePyramids(
                    vmaps=tuple(c3(v, lv)
                                for lv, v in enumerate(fp.vmaps)),
                    nmaps=tuple(c3(nm, lv)
                                for lv, nm in enumerate(fp.nmaps)),
                    depths=tuple(c2(d, lv)
                                 for lv, d in enumerate(fp.depths)),
                    intensities=tuple(c2(g, lv)
                                      for lv, g in enumerate(
                                          fp.intensities)),
                    masks=tuple(c2(mk, lv)
                                for lv, mk in enumerate(fp.masks)),
                )
                # model pyramids build on a HALO-padded crop and trim per
                # level: the blended photometric term reads a ~2 px blur +
                # 2 px erosion halo around every pixel at every level, and
                # building from a tight crop would make the coarse levels
                # diverge from the full-frame pass at the window border
                # (amplified by the ill-conditioned few-pixel coarse
                # systems).  P=32 keeps 8 px of halo even at level 2.
                P = 32
                pads2 = ((P, P), (P, P), (0, 0))
                pvp = jnp.pad(pv, pads2, constant_values=jnp.nan)
                pnp = jnp.pad(pn, pads2, constant_values=jnp.nan)
                pcp = jnp.pad(pc, pads2, constant_values=0.0)
                S = OW + 2 * P
                pvc = jax.lax.dynamic_slice(pvp, (oy, ox, z0), (S, S, 3))
                pnc = jax.lax.dynamic_slice(pnp, (oy, ox, z0), (S, S, 3))
                pcc = jax.lax.dynamic_slice(pcp, (oy, ox, z0), (S, S, 3))
                mp_pad = odo.build_model_pyramids(
                    pvc, pnc, pcc, pose, L, cfg.max_depth_rgb)

                def trim(a, lv):
                    p = P >> lv
                    n = OW >> lv
                    return a[p:p + n, p:p + n]

                from maskfusion_tpu.ops import reduce as red
                model_pyr = odo.ModelPyramids(
                    vmaps_g=tuple(trim(v, lv)
                                  for lv, v in enumerate(mp_pad.vmaps_g)),
                    nmaps_g=tuple(trim(nm, lv)
                                  for lv, nm in enumerate(mp_pad.nmaps_g)),
                    depths=tuple(trim(d, lv)
                                 for lv, d in enumerate(mp_pad.depths)),
                    intensities=tuple(trim(g, lv)
                                      for lv, g in enumerate(
                                          mp_pad.intensities)),
                    # erosion computed on the HALO image then trimmed, so
                    # window borders erode exactly like the full frame
                    last_valids=tuple(
                        trim(red.rgb_last_valid(g), lv)
                        for lv, g in enumerate(mp_pad.intensities)),
                )
                lc = L - 1
                so3c = jax.lax.dynamic_slice(
                    so3i, (oy >> lc, ox >> lc), (OW >> lc, OW >> lc))
                so3_pyr = [None] * lc + [so3c]
                pose0 = pose if warm is None else pose @ warm
                res = odo.get_incremental_transformation(
                    pose0[:3, 3], pose0[:3, :3],
                    fpc, model_pyr, tuple(so3_pyr), _intr_shift(oy, ox),
                    rgb_only=cfg.rgb_only,
                    icp_weight=cfg.object_icp_weight,
                    gn_damping=cfg.object_gn_damping,
                    rgb_finest_only=cfg.object_rgb_finest_only,
                    pyramid=cfg.pyramid, fast_odom=cfg.fast_odom,
                    use_so3=cfg.use_so3, mask_id=mid,
                    use_mask_rgb=cfg.mask_rgb_residual,
                    use_mask_icp=cfg.mask_icp_residual,
                    dist_thresh=cfg.dist_threshold,
                    angle_thresh_sine=cfg.angle_threshold_sine,
                    max_depth_delta_rgb=cfg.max_depth_delta_rgb,
                    sobel_scale=cfg.sobel_scale,
                    min_grad_magnitudes=cfg.min_grad_magnitudes,
                    translation_jump_limit=cfg.translation_jump_limit,
                    num_levels=cfg.num_pyr_levels,
                    assoc_period=cfg.assoc_period,
                    gn_step_eps=cfg.gn_step_eps,
                )
                pose_new = se3.make_pose(res.R, res.t)
                return pose_new, jnp.linalg.norm(res.delta[:3, 3])

            return jax.vmap(one)(poses, pvs, pns, pcs, so3s, mask_ids,
                                 oys, oxs)

        def fuse_clean_predict(state: MapState, prep: Preprocessed, rgb,
                               seg_mask, prev_pose, time, mask_id,
                               conf_threshold, max_depth, weight_multiplier,
                               allow_fill_in: bool, bucket: int,
                               parity: "int | None" = None,
                               compact: bool = True, gate=None):
            # gate: optional device bool scalar — the prefused pipeline
            # dispatches fuse back to back with tracking and gates the map
            # update on the SAME frame's tracking covariance (the reference
            # skips fusion when tracking is bad, MaskFusion.cpp:539; the
            # lagfuse path makes that decision host-side one frame late).
            # When gate is False the whole fuse+clean is selected away and
            # the predictions keep their previous values.
            pose = state.pose
            pose_inv = se3.pose_inverse(pose)
            if cfg.velocity_fusion_weight:
                weighting = fuse_ops.compute_fusion_weight(
                    state.last_delta, weight_multiplier
                )
            else:
                weighting = weight_multiplier
            full_map = state.map
            work = sm.prefix_view(full_map, bucket)
            # predictIndices renders with the GLOBAL depth cutoff — the
            # per-model max depth only gates which PIXELS may fuse, never
            # the model's own visibility (the reference passes
            # maxDepthProcessed here, MaskFusion.cpp:541, while data.vert's
            # maxDepth uniform gets min(depthCutoff, model max), :527;
            # gating the render by the per-model depth truncated small
            # objects' own predictions and made their tracking slide)
            im1 = splat_ops.render_index_map(
                work, pose_inv, intr, H, W, time, time_delta,
                cfg.depth_cutoff,
            )
            fres = fuse_ops.fuse(
                work, im1,
                prep.vmap_raw,
                prep.levels[0]["vmap"], prep.levels[0]["nmap"],
                rgb, seg_mask, mask_id, pose, intr, time, weighting,
                max_depth,
                checkerboard=cfg.fuse_subsample_checkerboard,
                parity=parity,
                merge_z_thresh=cfg.surfel_merge_z_thresh,
            )
            # second index map after fuse (the reference's schedule:
            # predictIndices -> fuse -> predictIndices -> clean,
            # MaskFusion.cpp:541-561); clean and the prediction reuse it.
            # incremental_im2 patches im1 instead of re-rendering (one
            # row-gather + dense merges vs a bucket-row sort render).
            if cfg.incremental_im2:
                conf_px = sm.pixel_confidence(H, W, intr, 1.0) * weighting
                rad_px = sm.radius_from_depth(
                    prep.levels[0]["vmap"][..., 2],
                    prep.levels[0]["nmap"][..., 2], intr)
                im2 = splat_ops.patch_index_map(
                    im1, fres.map, fres.new_pixels, prep.vmap_raw,
                    prep.levels[0]["nmap"], conf_px, rgb, rad_px,
                    pose_inv, time, work.count,
                )
            else:
                im2 = splat_ops.render_index_map(
                    fres.map, pose_inv, intr, H, W, time, time_delta,
                    cfg.depth_cutoff,
                )
            cres = clean_ops.clean(
                fres.map, im2, prep.filt_depth, seg_mask, mask_id, pose_inv,
                intr, time, time_delta, conf_threshold, max_depth,
                cfg.outlier_coefficient,
                unstable_time_limit=cfg.unstable_time_limit,
                compact=compact,
            )
            cres_map = cres.map
            if gate is not None:
                # select the pre-fuse prefix back in when tracking failed:
                # bucket-sized selects only (the untouched capacity tail is
                # shared through write_back)
                cres_map = jax.tree.map(
                    lambda n, o: jnp.where(gate, n, o), cres_map, work)
            final_map = sm.write_back(full_map, cres_map)
            # prediction reuses the post-fuse index map with clean's keep
            # mask gating the candidates (combinedPredict re-rasterises in
            # the reference; the index maps carry the same data here)
            idx = im2.index
            keep_img = jnp.where(
                idx >= 0, cres.keep[jnp.clip(idx, 0)], False)
            im2_gated = im2._replace(index=jnp.where(keep_img, idx, -1))
            # quarter-res index render feeds the multiscale predictor so
            # large projected footprints (surfels mapped far, viewed near)
            # are covered — splat.vert:54-66 sprite-size parity
            im_coarse = splat_ops.render_index_map(
                cres.map, pose_inv, intr.level(2), H >> 2, W >> 2, time,
                time_delta, cfg.depth_cutoff,
            )
            pred = splat_ops.combined_predict(im2_gated, intr,
                                              cfg.depth_cutoff,
                                              coarse=(im_coarse, 2))
            if allow_fill_in:
                # fill-in is enabled for the global model only — object
                # predictions must stay object-only or tracking would lock
                # onto the background (MaskFusion.cpp:619-624)
                filled = fill_ops.fill_in(
                    pred, rgb, prep.levels[0]["vmap"], prep.levels[0]["nmap"]
                )
                pv, pn, pc = filled.vmap, filled.nmap, filled.rgb
                if cfg.frame_to_frame_rgb:
                    # -ftf: the photometric term tracks against the raw frame
                    # (fill-in passthrough for the image; ICP stays
                    # frame-to-model) — Model::initICP, Model.cpp:396-401
                    pc = rgb.astype(jnp.float32)
            else:
                pv, pn, pc = pred.vmap, pred.nmap, pred.rgb
            delta = pose_inv @ prev_pose
            removed, appended = cres.removed, fres.map.count - work.count
            if gate is not None:
                # failed-tracking frames keep the previous predictions (the
                # lagfuse path skips the whole dispatch, leaving them stale)
                pv = jnp.where(gate, pv, state.pred_vmap)
                pn = jnp.where(gate, pn, state.pred_nmap)
                pc = jnp.where(gate, pc, state.pred_rgb)
                removed = jnp.where(gate, removed, 0)
                appended = jnp.where(gate, appended, 0)
            new_state = MapState(
                map=final_map, pose=pose, last_delta=delta,
                pred_vmap=pv, pred_nmap=pn, pred_rgb=pc,
                so3_intensity=prep.frame_pyr.intensities[cfg.num_pyr_levels - 1],
            )
            return new_state, removed, appended

        self._fuse_clean_predict = jax.jit(
            fuse_clean_predict, donate_argnums=(0,),
            static_argnames=("allow_fill_in", "bucket", "parity", "compact"),
        )

        def fused_static_step(state: MapState, rgb, depth, time,
                              bucket: int, parity: "int | None",
                              compact: bool = True):
            """preprocess + track + fuse + clean + predict in ONE dispatch —
            the -static fast path (remote/queued dispatch costs dominate
            multi-call frames).  `compact=False` frames kill culled surfels
            in place (clean's stream compaction costs ~4 ms/frame at VGA
            buckets); a compacting frame every DIAG_INTERVAL reclaims the
            holes and refreshes the true count."""
            zeros_mask = jnp.zeros((H, W), jnp.uint8)
            prep = preprocess(rgb, depth, zeros_mask)
            tr = track(state, prep, jnp.uint8(0))
            prev_pose = state.pose
            state = state._replace(pose=tr.pose)
            new_state, removed, appended = fuse_clean_predict(
                state, prep, rgb, zeros_mask, prev_pose, time, jnp.uint8(0),
                cfg.conf_threshold_global, cfg.depth_cutoff,
                cfg.weight_multiplier, True, bucket, parity, compact,
            )
            diag = (tr.icp_error, tr.icp_count, tr.rgb_count,
                    jnp.max(tr.cov_diag), new_state.map.count, removed,
                    appended)
            # pose_log copy rides the SAME dispatch: `+ 0.0` forces a buffer
            # distinct from new_state.pose, which is donated into the next
            # step (a separate host-side pose.copy() costs a full dispatch
            # round trip per frame on remote transports)
            return new_state, diag, tr.pose + 0.0

        self._fused_static_step = jax.jit(
            fused_static_step, donate_argnums=(0,),
            static_argnames=("bucket", "parity", "compact"),
        )

        def fuse_clean_predict_batched(states, prep: Preprocessed, rgb,
                                       seg_mask, prev_poses, time, mask_ids,
                                       conf_thresholds, max_depths,
                                       weight_multipliers, bucket: int,
                                       parity: "int | None" = None):
            """All equal-capacity OBJECT models' fuse+clean+predict in ONE
            vmapped dispatch (the reference loops models sequentially,
            MaskFusion.cpp:539-569; per-dispatch overhead dominates the
            multi-model frame otherwise).  Objects never fill-in
            (MaskFusion.cpp:619-624), so allow_fill_in is hardwired False."""

            def one(state, prev_pose, mask_id, conf_t, max_d, wm):
                return fuse_clean_predict(
                    state, prep, rgb, seg_mask, prev_pose, time, mask_id,
                    conf_t, max_d, wm, False, bucket, parity, True)

            return jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0))(
                states, prev_poses, mask_ids, conf_thresholds, max_depths,
                weight_multipliers)

        self._fuse_clean_predict_batched = jax.jit(
            fuse_clean_predict_batched, donate_argnums=(0,),
            static_argnames=("bucket", "parity"),
        )

        # Static object-window size (0 = windowing off for this engine)
        OW = int(cfg.object_window)
        if OW <= 0 or OW > min(H, W) or OW % 8:
            OW = 0
        self._obj_window = OW

        def _intr_shift(oy, ox):
            """Intrinsics with the principal point moved into crop coords —
            surfel<->pixel projections then operate directly in the (OW,OW)
            window (traced offsets; one compiled graph for all positions)."""
            return CameraIntrinsics(
                intr.fx, intr.fy,
                intr.cx - ox.astype(jnp.float32),
                intr.cy - oy.astype(jnp.float32))

        def fuse_clean_predict_obj_win(state: MapState, prep: Preprocessed,
                                       rgb, seg_mask, prev_pose, time,
                                       mask_id, conf_t, max_d, wm, oy, ox,
                                       bucket: int, parity: "int | None",
                                       gate=None):
            """Windowed OBJECT fuse+clean+predict: every image-side pass
            (index render, association, clean, coarse render, prediction)
            runs on a static (OW, OW) crop around the object's mask instead
            of the full frame — ~(H*W)/OW^2 less image-side work for small
            objects.  The window (chosen host-side from the previous
            segmentation + margin, engine._object_window) always contains
            the object's mask, so semantics match the full-frame pass for
            everything inside it; surfels projecting outside keep their
            state for the frame (same as off-screen surfels in the
            reference, MaskFusion.cpp:539-569).  Objects never fill in
            (MaskFusion.cpp:619-624)."""
            z0 = jnp.int32(0)

            def c2(a):
                return jax.lax.dynamic_slice(a, (oy, ox), (OW, OW))

            def c3(a):
                return jax.lax.dynamic_slice(
                    a, (oy, ox, z0), (OW, OW, a.shape[2]))

            intr_c = _intr_shift(oy, ox)
            vmap_raw = c3(prep.vmap_raw)
            vmap0 = c3(prep.levels[0]["vmap"])
            nmap0 = c3(prep.levels[0]["nmap"])
            filt = c2(prep.filt_depth)
            rgb_c = c3(rgb)
            seg_c = c2(seg_mask)
            pose = state.pose
            pose_inv = se3.pose_inverse(pose)
            if cfg.velocity_fusion_weight:
                weighting = fuse_ops.compute_fusion_weight(
                    state.last_delta, wm)
            else:
                weighting = wm
            full_map = state.map
            work = sm.prefix_view(full_map, bucket)
            im1 = splat_ops.render_index_map(
                work, pose_inv, intr_c, OW, OW, time, time_delta,
                cfg.depth_cutoff)
            fres = fuse_ops.fuse(
                work, im1, vmap_raw, vmap0, nmap0, rgb_c, seg_c, mask_id,
                pose, intr_c, time, weighting, max_d,
                checkerboard=cfg.fuse_subsample_checkerboard, parity=parity,
                merge_z_thresh=cfg.surfel_merge_z_thresh)
            if cfg.incremental_im2:
                conf_px = sm.pixel_confidence(OW, OW, intr_c, 1.0) * weighting
                rad_px = sm.radius_from_depth(
                    vmap0[..., 2], nmap0[..., 2], intr_c)
                im2 = splat_ops.patch_index_map(
                    im1, fres.map, fres.new_pixels, vmap_raw, nmap0,
                    conf_px, rgb_c, rad_px, pose_inv, time, work.count)
            else:
                im2 = splat_ops.render_index_map(
                    fres.map, pose_inv, intr_c, OW, OW, time, time_delta,
                    cfg.depth_cutoff)
            cres = clean_ops.clean(
                fres.map, im2, filt, seg_c, mask_id, pose_inv, intr_c,
                time, time_delta, conf_t, max_d, cfg.outlier_coefficient,
                unstable_time_limit=cfg.unstable_time_limit, compact=True)
            cres_map = cres.map
            if gate is not None:
                cres_map = jax.tree.map(
                    lambda n, o: jnp.where(gate, n, o), cres_map, work)
            final_map = sm.write_back(full_map, cres_map)
            idx = im2.index
            keep_img = jnp.where(
                idx >= 0, cres.keep[jnp.clip(idx, 0)], False)
            im2_gated = im2._replace(index=jnp.where(keep_img, idx, -1))
            im_coarse = splat_ops.render_index_map(
                cres.map, pose_inv, intr_c.level(2), OW >> 2, OW >> 2,
                time, time_delta, cfg.depth_cutoff)
            pred = splat_ops.combined_predict(
                im2_gated, intr_c, cfg.depth_cutoff, coarse=(im_coarse, 2))
            nanc = jnp.full((H, W, 3), jnp.nan, jnp.float32)
            pv = jax.lax.dynamic_update_slice(nanc, pred.vmap, (oy, ox, z0))
            pn = jax.lax.dynamic_update_slice(nanc, pred.nmap, (oy, ox, z0))
            pc = jax.lax.dynamic_update_slice(
                jnp.zeros((H, W, 3), jnp.float32), pred.rgb, (oy, ox, z0))
            if gate is not None:
                pv = jnp.where(gate, pv, state.pred_vmap)
                pn = jnp.where(gate, pn, state.pred_nmap)
                pc = jnp.where(gate, pc, state.pred_rgb)
            new_state = MapState(
                map=final_map, pose=pose, last_delta=pose_inv @ prev_pose,
                pred_vmap=pv, pred_nmap=pn, pred_rgb=pc,
                so3_intensity=prep.frame_pyr.intensities[
                    cfg.num_pyr_levels - 1],
            )
            return new_state

        self._fuse_clean_predict_obj_win = jax.jit(
            fuse_clean_predict_obj_win, donate_argnums=(0,),
            static_argnames=("bucket", "parity"))

        def project_ids_obj_win(m: sm.SurfelMap, pose, time, max_depth,
                                bucket: int, oy, ox):
            """Windowed object contribution to GlobalProjection: render +
            predict on the object's (OW, OW) crop, pasted into an inf depth
            canvas (GlobalProjection.cpp:48-75 renders full frames)."""
            intr_c = _intr_shift(oy, ox)
            im = splat_ops.render_index_map(
                sm.prefix_view(m, bucket), se3.pose_inverse(pose), intr_c,
                OW, OW, time, time_delta, max_depth, conf_threshold=12.0)
            pred = splat_ops.combined_predict(im, intr_c, max_depth)
            depth = jnp.where(pred.depth > 0, pred.depth, jnp.inf)
            return jax.lax.dynamic_update_slice(
                jnp.full((H, W), jnp.inf, jnp.float32), depth, (oy, ox))

        def project_ids(m: sm.SurfelMap, pose, time, max_depth,
                        bucket: int):
            """One model's contribution to the global (depth, id) projection
            (GlobalProjection::project, conf threshold 12 hardcoded at
            GlobalProjection.cpp:61)."""
            im = splat_ops.render_index_map(
                sm.prefix_view(m, bucket), se3.pose_inverse(pose), intr,
                H, W, time, time_delta, max_depth, conf_threshold=12.0,
            )
            pred = splat_ops.combined_predict(im, intr, max_depth)
            depth = jnp.where(pred.depth > 0, pred.depth, jnp.inf)
            return depth

        self._project_ids = jax.jit(project_ids,
                                    static_argnames=("bucket",))

        def project_ids_batched(maps, poses, time, max_depths, bucket: int):
            """All equal-capacity object models' (depth, id) projections in
            one vmapped dispatch (GlobalProjection::project loops models,
            GlobalProjection.cpp:48-75)."""
            return jax.vmap(
                lambda m, p, md: project_ids(m, p, time, md, bucket)
            )(maps, poses, max_depths)

        self._project_ids_batched = jax.jit(project_ids_batched,
                                            static_argnames=("bucket",))

        def erase_error(m: sm.SurfelMap, seg_mask, mask_id, depth, pose,
                        bucket: int):
            """Spawn subtraction on the global map (eraseErrorGeometry,
            MaskFusion.cpp:355-358)."""
            work = sm.prefix_view(m, bucket)
            out, removed = clean_ops.erase_error_geometry(
                work, seg_mask, mask_id, depth, se3.pose_inverse(pose), intr,
                cfg.spawn_subtraction_window,
            )
            return sm.write_back(m, out), removed

        self._erase_error = jax.jit(erase_error,
                                    static_argnames=("bucket",))

        def combine_ids(depths, ids_vec):
            """argmin over the model axis -> uint8 id image (host-free part
            of GlobalProjection::downloadDirect)."""
            stack = jnp.stack(depths)
            arg = jnp.argmin(stack, axis=0)
            have = jnp.isfinite(jnp.min(stack, axis=0))
            ids = ids_vec[arg]
            return jnp.where(have, ids, 0).astype(jnp.uint8)

        self._combine_ids = jax.jit(combine_ids)

        def init_map(prep: Preprocessed, rgb, seg_mask, mask_id, pose, time,
                     capacity, weighting: float = 1.0):
            m = sm.init_from_frame(
                capacity,
                prep.vmap_raw, prep.levels[0]["vmap"],
                prep.levels[0]["nmap"], rgb, seg_mask, mask_id, pose, intr,
                time, weighting,
            )
            im = splat_ops.render_index_map(
                m, se3.pose_inverse(pose), intr, H, W, time, time_delta,
                cfg.depth_cutoff,
            )
            pred = splat_ops.combined_predict(im, intr, cfg.depth_cutoff)
            filled = fill_ops.fill_in(
                pred, rgb, prep.levels[0]["vmap"], prep.levels[0]["nmap"]
            )
            return MapState(
                map=m, pose=pose, last_delta=jnp.eye(4),
                pred_vmap=filled.vmap, pred_nmap=filled.nmap,
                pred_rgb=filled.rgb,
                so3_intensity=prep.frame_pyr.intensities[cfg.num_pyr_levels - 1],
            )

        self._init_map = jax.jit(init_map,
                                 static_argnames=("capacity", "weighting"))

        # ---- fused pipelined dispatches ----
        # The multi-object frame otherwise issues ~10 separate jitted calls
        # plus per-frame jnp.stack storms (each call ~5 ms dispatch overhead
        # on the remote transport; measured 252 ms/frame of device-queue
        # wait at 2 objects).  Mirror the -static fast path: ONE dispatch
        # for the pre-segmentation device stage and ONE for all models'
        # fuse+clean+predict.  The reference pays the same costs as ~40
        # kernel launches + GL passes per frame (MaskFusion.cpp:200-607).
        def pipelined_device_stage(glob_state, obj_states, obj_aux,
                                   ids_vec, rgb, depth, prev_seg, time,
                                   glob_bucket: int, obj_bucket: int,
                                   windowed: bool = False):
            """preprocess + track(all models) + GlobalProjection + edge map
            in one graph.  Poses in the projection are the NEW tracked poses
            (the reference's order, MaskFusion.cpp:240-296).

            obj_aux is ONE packed (n_obj, 3) f32 array [mask_id, oy, ox] —
            each separate small host->device upload costs a dispatch round
            trip on remote transports.  For the same reason every per-frame
            host-bound scalar (counts, cov, jumps, prev/world poses) is
            packed into ONE f32 `hostvec` output: the probe measured THREE
            separate scalar np.asarray fetches at ~57 ms EACH while the
            1.2 MB ids image (async-copied) fetched in ~0 ms."""
            prep = preprocess(rgb, depth, prev_seg)
            tr = track(glob_state, prep, jnp.uint8(0))
            warm = (se3.pose_inverse(glob_state.pose) @ tr.pose
                    if cfg.object_warm_start else None)
            cov = jnp.max(tr.cov_diag)
            n_obj = len(obj_states)
            obj_mids = obj_aux[:, 0].astype(jnp.uint8)
            if n_obj:
                # model-axis sharding: each device solves its shard of the
                # per-object GN systems (no-op without a mesh)
                stk = self._shard_model_axis((
                    jnp.stack([s.pose for s in obj_states]),
                    jnp.stack([s.pred_vmap for s in obj_states]),
                    jnp.stack([s.pred_nmap for s in obj_states]),
                    jnp.stack([s.pred_rgb for s in obj_states]),
                    jnp.stack([s.so3_intensity for s in obj_states])))
            if n_obj and windowed:
                new_poses, jumps = track_objects_win(
                    *stk,
                    obj_mids, obj_aux[:, 1].astype(jnp.int32),
                    obj_aux[:, 2].astype(jnp.int32), prep, warm)
            elif n_obj:
                new_poses, jumps = track_objects(
                    *stk, obj_mids, prep, warm)
            else:
                new_poses = jnp.zeros((0, 4, 4), jnp.float32)
                jumps = jnp.zeros((0,), jnp.float32)
            if n_obj:
                # dead padding slots (object-axis size classes): their GN
                # systems are degenerate (all-invalid predictions) — keep
                # the dummy's identity pose and a zero jump so the slot
                # stays finite through projection/hostvec
                alive = obj_aux[:, 0] < float(DEAD_SLOT_ID)
                new_poses = jnp.where(alive[:, None, None], new_poses,
                                      stk[0])
                jumps = jnp.where(alive, jumps, 0.0)
            depths = [project_ids(glob_state.map, tr.pose, time,
                                  cfg.depth_cutoff, glob_bucket)]
            for i in range(n_obj):
                if windowed:
                    depths.append(project_ids_obj_win(
                        obj_states[i].map, new_poses[i], time,
                        cfg.depth_cutoff, obj_bucket,
                        obj_aux[i, 1].astype(jnp.int32),
                        obj_aux[i, 2].astype(jnp.int32)))
                else:
                    depths.append(project_ids(
                        obj_states[i].map, new_poses[i], time,
                        cfg.depth_cutoff, obj_bucket))
            ids = combine_ids(depths, ids_vec)
            # only the 1-byte non-edge binary is fetched host-side; the f32
            # edge magnitude image (1.2 MB at VGA) never crosses the wire
            _edge, nonedge = self.segmenter._edge_binary(
                prep.levels[0]["vmap"], prep.levels[0]["nmap"])
            counts = jnp.stack(
                [glob_state.map.count] + [s.map.count for s in obj_states])
            # pre-tracking poses (fuse-stage prev_pose inputs) and TUM-log
            # world poses (object-to-world = glob @ inv(obj), CLAUDE.md
            # convention / MaskFusion.cpp:578-602) ride the hostvec so the
            # host never issues per-model pose copies or matmul dispatches
            prev_poses = jnp.stack(
                [glob_state.pose] + [s.pose for s in obj_states])
            world_poses = jnp.stack(
                [tr.pose] + [tr.pose @ se3.pose_inverse(new_poses[i])
                             for i in range(n_obj)])
            hostvec = jnp.concatenate([
                counts.astype(jnp.float32), cov[None], jumps,
                prev_poses.reshape(-1), world_poses.reshape(-1)])
            # per-object poses unstacked INSIDE the graph — host-side
            # indexing of the stacked array would be one dispatch per model
            pose_tuple = tuple(new_poses[i] for i in range(n_obj))
            # device-side tracking-ok gate for the prefused fuse dispatch
            # (the host reads the same cov from hostvec, frames later)
            okf = cov <= jnp.float32(self._cov_thresh)
            return (prep, tr.pose, pose_tuple, hostvec, ids, nonedge,
                    prev_poses, okf)

        self._pipelined_device_stage = jax.jit(
            pipelined_device_stage,
            static_argnames=("glob_bucket", "obj_bucket", "windowed"))

        def pipelined_fuse_stage(glob_state, obj_states, prep, rgb,
                                 seg_mask, prev_poses, time, obj_params,
                                 glob_bucket: int, obj_bucket: int,
                                 parity: "int | None",
                                 windowed: bool = False, gate=None,
                                 ids_guard=None):
            """All models' fuse+clean+predict in one graph (global + vmapped
            equal-capacity objects; MaskFusion.cpp:539-569 loops models).
            prev_poses is ONE stacked (n_models, 4, 4) array (row 0 global)
            and obj_params ONE (n_obj, 6) f32 [mask_id, conf_t, max_depth,
            weight_mult, oy, ox] — single uploads instead of a per-field
            dispatch storm on remote transports.  `gate` (prefused pipeline)
            is the device-side tracking-ok scalar from the same frame's
            device stage — when False the map updates select away.

            `ids_guard` (prefused pipeline): the SAME-frame model-id
            projection from the device stage.  The prefused fuse consumes a
            segmentation that lags by however many frames the host pipeline
            is deep; around moving objects the stale mask assigns leading/
            trailing-edge pixels to the wrong model, smearing object pixels
            into the global map (observed: phantom model spawns on the
            smeared regions).  The guard neutralises exactly those pixels:
            where the stale seg and the current projection BOTH claim a
            (different) model, the pixel becomes 255 (semantic-ignore — no
            model fuses it and no clean penalty fires).  ids==0 pixels keep
            the stale label so disocclusions still fuse into the global map
            and freshly-spawned objects (whose maps project nothing yet)
            can bootstrap."""
            if ids_guard is not None:
                seg_mask = jnp.where(
                    (seg_mask == ids_guard) | (ids_guard == 0),
                    seg_mask, jnp.uint8(255))
            new_glob, _removed, _app = fuse_clean_predict(
                glob_state, prep, rgb, seg_mask, prev_poses[0], time,
                jnp.uint8(0), cfg.conf_threshold_global, cfg.depth_cutoff,
                cfg.weight_multiplier, True, glob_bucket, parity, True,
                gate)
            if obj_states:
                stacked = self._shard_model_axis(
                    jax.tree.map(lambda *xs: jnp.stack(xs), *obj_states))

                if windowed:
                    def one_w(state, prev_pose, params):
                        return fuse_clean_predict_obj_win(
                            state, prep, rgb, seg_mask, prev_pose, time,
                            params[0].astype(jnp.uint8), params[1],
                            params[2], params[3],
                            params[4].astype(jnp.int32),
                            params[5].astype(jnp.int32),
                            obj_bucket, parity, gate)

                    new_stack = jax.vmap(one_w)(
                        stacked, prev_poses[1:], obj_params)
                else:
                    def one(state, prev_pose, params):
                        ns, _rem, _ap = fuse_clean_predict(
                            state, prep, rgb, seg_mask, prev_pose, time,
                            params[0].astype(jnp.uint8), params[1],
                            params[2], params[3], False, obj_bucket,
                            parity, True, gate)
                        return ns

                    new_stack = jax.vmap(one)(
                        stacked, prev_poses[1:], obj_params)
                new_objs = tuple(
                    jax.tree.map(lambda x, i=i: x[i], new_stack)
                    for i in range(len(obj_states)))
            else:
                new_objs = ()
            return new_glob, new_objs

        self._pipelined_fuse_stage = jax.jit(
            pipelined_fuse_stage, donate_argnums=(0, 1),
            static_argnames=("glob_bucket", "obj_bucket", "parity",
                             "windowed"))

    def _shard_model_axis(self, tree):
        """Model-axis GSPMD sharding on a leading model-stacked axis —
        delegates to the single shared implementation in
        parallel.multimodel (used here, by the dryrun, and by tests)."""
        from maskfusion_tpu.parallel.multimodel import shard_model_axis

        return shard_model_axis(self._model_mesh, self._model_axis, tree)

    # ------------------------------------------------------------ lifecycle
    def _get_next_model_id(self, assign: bool) -> int:
        nxt = self.next_id
        if assign:
            if len(self.models) >= self.cfg.max_models:
                raise RuntimeError("maximum number of models (256) in use")
            used = {m.model_id for m in self.models}
            if self.cfg.enable_redetection or self.cfg.keep_all_models:
                # kept inactive models can be reactivated later; reusing
                # their id would give two active models one mask label
                used |= {m.model_id for m in self.inactive_models}
            while True:
                self.next_id = (self.next_id + 1) % 256 or 1
                # 255 is the semantic-ignore mask label and 254 the dead
                # padding-slot sentinel (DEAD_SLOT_ID) — neither may ever
                # name a live model
                if self.next_id not in used and self.next_id < 254:
                    break
        return nxt

    def _redetect(self, frame, roi):
        if self._matcher is None:
            from maskfusion_tpu.mapping.model_matching import FernModelMatcher

            self._matcher = FernModelMatcher()
        return self._matcher.detect_in_region(frame, roi,
                                              self.inactive_models)

    def _inactivate_model(self, model: Model, reason: str):
        """Smart delete (MaskFusion::inactivateModel, :699-713)."""
        keep = self.cfg.keep_all_models or (
            model.surfel_count >= self.cfg.min_surfels_keep
            and model.conf_threshold > self.cfg.min_conf_keep
        )
        if keep:
            self.inactive_models.append(model)
            if self.cfg.enable_redetection:
                if self._matcher is None:
                    from maskfusion_tpu.mapping.model_matching import (
                        FernModelMatcher,
                    )

                    self._matcher = FernModelMatcher()
                self._matcher.build_model_description(model)
        for cb in self.inactive_model_listeners:
            cb(model)
        self.models.remove(model)

    # ------------------------------------------------------------ frame API
    def upload_frame(self, frame: FrameData) -> FrameData:
        """Asynchronously stage a frame's images in device HBM.

        The device_put pair runs on a single uploader thread: even though
        device_put itself is logically async, its HOST-return time on the
        remote transport measured ~6.6 ms/frame (RPC serialisation holds
        the caller) — on the uploader thread that cost overlaps the main
        thread's dispatch work.  process_frame joins the staging future
        transparently."""
        depth = frame.depth
        if not isinstance(depth, jax.Array) and depth.dtype != np.uint16:
            # uint16 millimetres upload RAW (0.6 MB vs 1.2 MB at VGA) and
            # convert on device inside preprocess; anything else stages as
            # float32 metres
            depth = depth.astype(np.float32)
        if self._uploader is None:
            import concurrent.futures

            self._uploader = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="mft-upload")
        fut = self._uploader.submit(
            lambda r=frame.rgb, d=depth: (jax.device_put(r),
                                          jax.device_put(d)))
        return dataclasses.replace(
            frame,
            staged_future=fut,
            rgb_host=frame.rgb,
            depth_host=frame.host_depth(),
        )

    def process_frame(self, frame: FrameData,
                      gt_pose: Optional[np.ndarray] = None) -> Dict:
        self.tick += 1
        t0 = _time.perf_counter()
        cfg = self.cfg
        H, W = self.res.height, self.res.width
        if frame.staged_future is not None:
            # join the uploader thread's device_put pair (upload_frame)
            rgb_dev, depth_dev = frame.staged_future.result()
            frame = dataclasses.replace(
                frame, rgb=rgb_dev, depth=depth_dev, staged_future=None)
        # pipelined multi-object scheduling: host work for frame t-1
        # overlaps device work for frame t (zero blocking syncs per frame)
        if (not cfg.static_mode and gt_pose is None and self.ferns is None
                and cfg.pipelined_multiobject and self.models
                and self.segmenter is not None
                and hasattr(self.segmenter, "_edge_binary")):
            return self._pipelined_step(frame, t0)
        rgb = jnp.asarray(frame.rgb)
        depth = jnp.asarray(frame.depth)   # u16 mm uploads raw; preprocess
        if depth.dtype not in (jnp.uint16, jnp.float32):  # converts on device
            depth = depth.astype(jnp.float32)
        prev_seg = jnp.asarray(
            self.last_segmentation
            if self.last_segmentation is not None
            else np.zeros((H, W), np.uint8)
        )

        with self.stopwatch.scope("Preprocess"):
            prep = self._preprocess(rgb, depth, prev_seg)

        if not self.models:
            pose0 = jnp.asarray(
                (gt_pose if gt_pose is not None else np.eye(4)).astype(np.float32)
            )
            state = self._init_map(
                prep, rgb, prev_seg, jnp.uint8(0), pose0, float(self.tick),
                cfg.global_surfel_capacity,
            )
            self.models.append(Model(
                model_id=0, state=state,
                conf_threshold=cfg.conf_threshold_global,
                max_depth=cfg.depth_cutoff, is_static=False,
            ))
            self._last_count = self.models[0].surfel_count
            self._log_poses(frame)
            return {"tick": self.tick, "surfels": self.models[0].surfel_count,
                    "tracking_ok": True, "n_models": 1}

        # -static fast path: one fused dispatch + ONE host readback per
        # frame (each device->host sync is a full round trip on remote
        # transports; scattered float()/int() reads dominate otherwise)
        if (cfg.static_mode and gt_pose is None and self.ferns is None):
            glob = self.models[0]
            # extrapolate the (up to DIAG_INTERVAL-1 frames stale) fetched
            # count with the observed append rate so a fast-exploration
            # burst can't silently outgrow the bucket for long
            est = min(
                self._last_count
                + int(self._append_rate * (self._frames_since_flush + 1)),
                glob.state.map.capacity)
            self._frames_since_flush += 1
            bucket = sm.choose_bucket(est,
                                      glob.state.map.capacity,
                                      current=glob.last_bucket)
            glob.last_bucket = bucket
            statics = dict(bucket=bucket,
                           parity=(self.tick % 2
                                   if cfg.fuse_subsample_checkerboard
                                   else None),
                           compact=(self.tick % self.DIAG_INTERVAL == 0))
            self._note_prewarm("static_step", self._fused_static_step,
                               (glob.state, rgb, depth, float(self.tick)),
                               statics)
            glob.state, d, pose_out = self._fused_static_step(
                glob.state, rgb, depth, float(self.tick), **statics)
            # pose log keeps the step's own device-side pose output (the
            # state is donated into the next step; export converts lazily)
            # — a host-issued pose.copy() would cost one extra dispatch
            # round trip per frame
            glob.pose_log.append({
                "timestamp": frame.timestamp or float(self.tick),
                "tick": self.tick, "pose": pose_out,
            })
            glob.age += 1
            # No per-frame sync: diagnostics stay on device and are fetched
            # every DIAG_INTERVAL frames (a device->host round trip costs
            # hundreds of ms on remote transports and would serialise the
            # pipeline).  `flush_diagnostics()` forces a fetch.
            self._pending_diag = d
            out = {"tick": self.tick, "surfels": self._last_count,
                   "n_models": 1, "tracking_ok": self._last_tracking_ok}
            if self.tick % self.DIAG_INTERVAL == 0:
                out.update(self.flush_diagnostics())
            self.stopwatch.record("Run",
                                  (_time.perf_counter() - t0) * 1000)
            if self._diag_exporter:
                self._diag_exporter.record(self, out)
            return out

        # ---------------- tracking (MaskFusion.cpp:240-278) ----------------
        diag: Dict = {"tick": self.tick}
        glob = self.models[0]
        for model in self.models:
            model.prev_pose = np.asarray(model.state.pose)
        with self.stopwatch.scope("odom"):
            if gt_pose is None:
                glob_prev_pose = glob.state.pose
                tr = self._track(glob.state, prep, jnp.uint8(0))
                glob.state = glob.state._replace(pose=tr.pose)
                warm = (self._camera_motion(glob_prev_pose, tr.pose)
                        if cfg.object_warm_start else None)
                cov_max = float(np.asarray(tr.cov_diag).max())
                tracking_ok = cov_max <= self._cov_thresh
                diag.update(icp_error=float(tr.icp_error),
                            icp_count=float(tr.icp_count))
            else:
                gp_new = jnp.asarray(gt_pose.astype(np.float32))
                warm = (self._camera_motion(glob.state.pose, gp_new)
                        if cfg.object_warm_start else None)
                glob.state = glob.state._replace(pose=gp_new)
                tracking_ok = True

            trackable = cfg.trackable_classes
            pending_jumps = []
            tracked = []
            for model in list(self.models[1:]):
                is_trackable = (not trackable) or (model.class_id in trackable)
                if is_trackable:  # trackAllModels=true default (MaskFusion.h:397)
                    tracked.append(model)
                else:
                    cam = np.asarray(glob.state.pose)
                    model.state = model.state._replace(
                        pose=jnp.asarray(model.initial_c2w_inv @ cam)
                    )
            if tracked and (len(tracked) == 1
                            or not cfg.batch_object_tracking):
                for model in tracked:
                    trm = self._track(model.state, prep,
                                      jnp.uint8(model.model_id),
                                      is_object=True, warm=warm)
                    model.state = model.state._replace(pose=trm.pose)
                    pending_jumps.append(
                        (model, jnp.linalg.norm(trm.delta[:3, 3])))
            elif tracked:
                # one vmapped dispatch for ALL object models (the reference
                # loops sequentially, MaskFusion.cpp:246-278)
                new_poses, jump_norms = self._track_objects(
                    jnp.stack([m.state.pose for m in tracked]),
                    jnp.stack([m.state.pred_vmap for m in tracked]),
                    jnp.stack([m.state.pred_nmap for m in tracked]),
                    jnp.stack([m.state.pred_rgb for m in tracked]),
                    jnp.stack([m.state.so3_intensity for m in tracked]),
                    jnp.asarray([m.model_id for m in tracked],
                                jnp.uint8),
                    prep, warm,
                )
                for i, model in enumerate(tracked):
                    model.state = model.state._replace(pose=new_poses[i])
                    pending_jumps.append((model, jump_norms[i]))
            if pending_jumps:
                # one host sync for all jump checks (MaskFusion.cpp:267-272)
                jumps = jax.device_get(jnp.stack(
                    [j for _, j in pending_jumps]))
                for (model, _), jump in zip(pending_jumps, jumps):
                    if float(jump) > cfg.model_deactivate_jump:
                        self._inactivate_model(model, "movement")

        # tracking-loss bookkeeping (-rl; MaskFusion.cpp:377-414)
        if cfg.relocalisation:
            if not self.lost:
                if not tracking_ok:
                    self.bad_tracking_streak += 1
                    if self.bad_tracking_streak > 10:
                        self.lost = True
                else:
                    self.bad_tracking_streak = 0
            elif self.last_frame_recovery:
                if tracking_ok:
                    self.lost = False
                    self.bad_tracking_streak = 0
                self.last_frame_recovery = False

        # fern loop closure / relocalisation (MaskFusion.cpp:423-537)
        fern_accepted = False
        if self.ferns is not None and cfg.close_loops:
            self.last_frame_recovery = False
            small = self._fern_views(glob)
            res = self.ferns.find_frame(
                np.asarray(glob.state.pose), *small,
                time=self.tick, lost=self.lost,
            )
            if res.pose is not None:
                if self.lost:
                    glob.state = glob.state._replace(
                        pose=jnp.asarray(res.pose.astype(np.float32)))
                    self.last_frame_recovery = True
                else:
                    fern_accepted = self._apply_loop_closure(glob, res)
                    if fern_accepted:
                        # the reference overrides the camera pose with the
                        # fern recovery pose on acceptance
                        # (MaskFusion.cpp:443-456) so the camera stays
                        # consistent with the deformed map
                        glob.state = glob.state._replace(
                            pose=jnp.asarray(res.pose.astype(np.float32)))

        seg_mask_np = np.zeros((H, W), np.uint8)
        if not cfg.static_mode:
            # -------- global projection + segmentation (:289-296) --------
            with self.stopwatch.scope("segmentation"):
                ids = np.asarray(self._project_ids_all(float(self.tick)))
                seg_mask_np = self._segment_and_update_models(
                    frame, prep, rgb, ids)
        else:
            self.last_segmentation = seg_mask_np

        # ---------------- fuse / clean / predict (:539-569) ----------------
        do_fuse = tracking_ok and not self.lost and not cfg.rgb_only
        with self.stopwatch.scope("fuse"):
            self._dispatch_fuse(prep, rgb, seg_mask_np, self.tick, do_fuse)

        if self.ferns is not None and not self.lost:
            small = self._fern_views(glob)
            self.ferns.add_frame(*small, np.asarray(glob.state.pose),
                                 self.tick, cfg.fern_threshold)

        self._log_poses(frame)
        for model in self.models:
            model.age += 1

        diag.update(
            surfels=glob.surfel_count,
            n_models=len(self.models),
            model_ids=[m.model_id for m in self.models],
            tracking_ok=tracking_ok,
            lost=self.lost,
        )
        self.stopwatch.record("Run", (_time.perf_counter() - t0) * 1000)
        if self._diag_exporter:
            self._diag_exporter.record(self, diag, prep.levels[0]["vmap"])
        return diag

    # ------------------------------------------------- shared frame stages
    @staticmethod
    def _camera_motion(pose_prev, pose_new):
        """prev->new camera world-motion; objects warm-start their GN at
        pose_prev_obj @ motion ("world-static until the data says
        otherwise", Model.h:263-268's makeStatic philosophy)."""
        return jax.jit(lambda a, b: se3.pose_inverse(a) @ b)(
            jnp.asarray(pose_prev), jnp.asarray(pose_new))

    def _bucket_for(self, model: Model) -> int:
        """Choose a model's per-frame processing bucket without forcing a
        device sync in pipelined mode: counts are prefetched asynchronously
        each frame (see _pipelined_step) and consumed one frame stale — safe
        because bucket overflow is a soft failure (dropped appends re-apply
        next frame) and choose_bucket adds headroom."""
        tun = self._tuning
        if model.model_id == 0:
            minimum, headroom = tun.min_bucket_global, tun.headroom_global
        else:
            # object maps hold tens of thousands of surfels; the global
            # bucket floor would make every vmapped per-object pass pay
            # ~10x dead rows (per-surfel costs scale with bucket, not count)
            minimum, headroom = tun.min_bucket_object, tun.headroom_object
        if self._pipelined_active and model.count_est >= 0:
            count = model.count_est
        else:
            count = model.surfel_count          # blocking fetch (sync path)
            model.count_est = count
        # pow2 steps for EVERY model on the multi-object path: each bucket
        # rung recompiles the whole fuse+clean+predict graph (minutes on the
        # remote transport), so fewer rungs beat tighter buckets here.  The
        # -static fast path keeps quarter-octave steps (one small graph).
        b = sm.choose_bucket(count, model.state.map.capacity,
                             headroom=headroom, minimum=minimum,
                             current=model.last_bucket,
                             pow2_steps=True)
        model.last_bucket = b
        return b

    def _dummy_obj_state(self, capacity: int, slot: int) -> MapState:
        """Dead padding-slot state for the pipelined graphs' object axis:
        empty map, identity pose, all-invalid predictions.  Its tracking
        lanes are select-sanitised in the device stage (mask DEAD_SLOT_ID)
        and its fuse matches zero pixels, so it only costs compute.  Cached
        PER SLOT — the fuse stage donates its inputs, so (a) two slots may
        never alias one buffer ("donate the same buffer twice") and (b)
        each slot's cache entry is refreshed from that slot's returned
        state after a donating dispatch (_refresh_dummies)."""
        key = (capacity, slot)
        st = self._dummy_state_cache.get(key)
        if st is None:
            g = self.models[0].state
            st = MapState(
                map=sm.empty(capacity),
                pose=jnp.eye(4, dtype=jnp.float32),
                last_delta=jnp.eye(4, dtype=jnp.float32),
                pred_vmap=jnp.full_like(g.pred_vmap, jnp.nan),
                pred_nmap=jnp.full_like(g.pred_nmap, jnp.nan),
                pred_rgb=jnp.zeros_like(g.pred_rgb),
                so3_intensity=jnp.zeros_like(g.so3_intensity),
            )
            self._dummy_state_cache[key] = st
        return st

    def _padded_obj_states(self, objs, n_slots: int):
        """State tuple for the pipelined graphs' object axis: live models
        first, then per-slot dead states up to the size class."""
        pad = n_slots - len(objs)
        states = tuple(m.state for m in objs)
        if pad > 0:
            cap = (objs[0].state.map.capacity if objs
                   else self.cfg.object_surfel_capacity)
            states = states + tuple(
                self._dummy_obj_state(cap, len(objs) + k)
                for k in range(pad))
        return states

    def _refresh_dummies(self, objs, obj_states, new_objs):
        """After a donating fuse dispatch, the cached dead-slot buffers are
        invalid — re-cache each slot from its returned state (fusing and
        cleaning an empty DEAD-masked map is a no-op, so it stays a valid
        dummy)."""
        for k in range(len(objs), len(obj_states)):
            cap = obj_states[k].map.capacity
            self._dummy_state_cache[(cap, k)] = new_objs[k]

    def _cf_model_views(self, frame: FrameData):
        """Per-model alignment-error + confidence views for the Co-Fusion
        CRF (the reference feeds per-model ICP-error/conf textures into its
        unaries, CfSegmentation.cpp:108-228; without them the projected-id
        fallback's error ceiling of 0.05*depth_range can never clear the
        unary_threshold_new=5 bar, so motion spawning is structurally dead).

        error = max(geometric, photometric) residual of the model's last
        prediction against the live frame, in metres-equivalent units:
          geometric   |predicted z - frame z| — catches out-of-plane motion;
          photometric |predicted gray - frame gray| / 255 * k_photo *
                      depth-scale — catches in-plane motion of textured
                      objects, which leaves no depth residual on flat
                      patches (k_photo = 0.5: a ~64-graylevel disagreement
                      rates like a quarter-depth-range geometric error, the
                      CRF's spawn bar).
        conf = prediction coverage (valid predicted depth).  Pixels with no
        frame depth carry zero error (holes never vote for motion)."""
        d = frame.host_depth()
        rgb = np.asarray(frame.rgb, np.float32)
        gray = rgb.mean(axis=-1)
        dr = float(np.nanmax(d) - np.nanmin(d[d > 0])) if (d > 0).any() else 1.0
        dr = max(dr, 1e-3)

        # The prediction is one pose stale (it tracked this frame), so a
        # moving camera shifts it a few px against the live image — on
        # high-frequency texture a raw per-pixel |dI| then reads as error
        # EVERYWHERE and the CRF spawns phantom models (measured: 3 object
        # models for 1 real object, camera ATE 21 mm vs 3 mm).  8x8
        # mask-aware average pooling before differencing removes the
        # misalignment sensitivity while a real object's gross color
        # disagreement (many-px motion / different hue) survives.
        B = 8
        Hc = (gray.shape[0] // B) * B
        Wc = (gray.shape[1] // B) * B

        def pool(a):
            return a[:Hc, :Wc].reshape(Hc // B, B, Wc // B, B).mean((1, 3))

        def unpool(a, H, W):
            u = np.repeat(np.repeat(a, B, 0), B, 1)
            out = np.zeros((H, W), a.dtype)
            out[:Hc, :Wc] = u
            return out

        H, W = gray.shape
        gray_p = pool(gray)
        views = []
        for m in self.models:
            pz = np.asarray(m.state.pred_vmap[..., 2])
            pg = np.asarray(m.state.pred_rgb, np.float32).mean(axis=-1)
            cov = np.isfinite(pz) & (pz > 0)
            covf = cov.astype(np.float32)
            both = cov & (d > 0)
            # disocclusion-trail gate: where the predicted surface is in
            # FRONT of the frame depth the surface moved AWAY (the frame
            # sees background behind it) — that is the object's trail, and
            # its error must not vote or the CRF spawns a phantom model on
            # the vacated region; clean's free-space violation removes the
            # stale surfels within a few frames (copy_unstable.vert:87-115)
            trail = np.nan_to_num(pz) < (d - 0.03)
            both = both & ~trail
            geom = np.where(both, np.abs(np.nan_to_num(pz) - d), 0.0)
            den = pool(covf)
            pg_p = pool(np.nan_to_num(pg) * covf) / np.maximum(den, 1e-6)
            dI = np.where(den > 0.5, np.abs(pg_p - gray_p), 0.0)
            photo = unpool(dI, H, W) / 255.0 * 0.5 * dr
            photo = np.where(both, photo, 0.0)
            views.append({
                "error": np.maximum(geom, photo).astype(np.float32),
                "conf": covf,
            })
        return views

    def _window_from_bbox(self, y0, x0, y1, x1):
        OW = self._obj_window
        H, W = self.res.height, self.res.width
        m = self.cfg.object_window_margin
        if (y1 - y0 + 1) + 2 * m > OW or (x1 - x0 + 1) + 2 * m > OW:
            return None
        oy = int(np.clip((y0 + y1 + 1 - OW) // 2, 0, H - OW)) & ~7
        ox = int(np.clip((x0 + x1 + 1 - OW) // 2, 0, W - OW)) & ~7
        return (oy, ox)

    def _object_window(self, model: Model, seg: np.ndarray):
        """Choose the (oy, ox) origin of the model's static processing
        window from its current mask + margin (host side, numpy).  Returns
        None when the mask doesn't fit — callers fall back to full-frame
        passes.  An empty mask keeps the previous window (the object is
        briefly unseen; its surfels still project near it)."""
        if not self._obj_window:
            return None
        sel = seg == model.model_id
        ys = sel.any(axis=1)
        if not ys.any():
            return model.window
        xs = sel.any(axis=0)
        y0, y1 = np.flatnonzero(ys)[[0, -1]]
        x0, x1 = np.flatnonzero(xs)[[0, -1]]
        return self._window_from_bbox(y0, x0, y1, x1)

    def _update_windows(self, seg: np.ndarray):
        if not self.models[1:] or not self._obj_window:
            return
        from maskfusion_tpu import cpp as native
        lib = native.load()
        if lib is None:
            for model in self.models[1:]:
                model.window = self._object_window(model, seg)
            return
        # ONE native pass over the label image covers every model (the
        # per-model numpy scan was ~0.6 ms x n_models per frame)
        bb = np.empty((256, 4), np.int32)
        segc = np.ascontiguousarray(seg)
        lib.mf_u8_bboxes(segc.reshape(-1), seg.shape[0], seg.shape[1],
                         bb.reshape(-1))
        for model in self.models[1:]:
            y0, x0, y1, x1 = bb[model.model_id]
            if y1 < 0:                      # label absent: keep window
                continue
            model.window = self._window_from_bbox(y0, x0, y1, x1)

    def _project_ids_all(self, time_f: float) -> jnp.ndarray:
        """Device-side GlobalProjection: all models' (depth, id) renders
        combined into one uint8 id image (GlobalProjection.cpp:48-75).  No
        host syncs — callers fetch the returned array."""
        cfg = self.cfg
        glob = self.models[0]
        depths = [self._project_ids(
            glob.state.map, glob.state.pose, time_f,
            cfg.depth_cutoff, bucket=self._bucket_for(glob),
        )]
        objs = self.models[1:]
        same_cap = len({m.state.map.capacity for m in objs}) <= 1
        if len(objs) >= 2 and same_cap:
            # one vmapped dispatch for all object models
            bucket = max(self._bucket_for(m) for m in objs)
            stacked = jax.tree.map(
                lambda *xs: jnp.stack(xs), *[m.state.map for m in objs])
            # depthCutoff for every model (GlobalProjection.cpp:60 binds
            # one maxDepth uniform for the whole pass)
            ds = self._project_ids_batched(
                stacked,
                jnp.stack([m.state.pose for m in objs]), time_f,
                jnp.full((len(objs),), cfg.depth_cutoff, jnp.float32),
                bucket=bucket,
            )
            depths.extend([ds[i] for i in range(len(objs))])
        else:
            for model in objs:
                depths.append(self._project_ids(
                    model.state.map, model.state.pose, time_f,
                    cfg.depth_cutoff, bucket=self._bucket_for(model),
                ))
        ids_vec = jnp.asarray(
            np.array([m.model_id for m in self.models], np.int32))
        return self._combine_ids(depths, ids_vec)

    def _segment_and_update_models(self, frame: FrameData, prep, rgb,
                                   ids: np.ndarray,
                                   nonedge=None,
                                   tick: "int | None" = None) -> np.ndarray:
        """Host segmentation + model lifecycle for one frame
        (MaskFusion.cpp:289-374): segmenter, redetection, spawning (with
        optional spawn subtraction), per-model maxDepth/confidence ramp.
        Returns the full segmentation mask."""
        cfg = self.cfg
        glob = self.models[0]
        if tick is None:
            tick = self.tick
        if self.spawn_offset < cfg.model_spawn_offset:
            self.spawn_offset += 1
        allow_new = (
            self.spawn_offset >= cfg.model_spawn_offset
            and len(self.models) < cfg.max_active_models
            and (cfg.mask_cutoff_frame is None
                 or tick <= cfg.mask_cutoff_frame)
        )
        infos = [ModelInfo(m.model_id, m.class_id) for m in self.models]
        kw = {"nonedge": nonedge} if nonedge is not None else {}
        if getattr(self.segmenter, "wants_model_views", False):
            kw["model_views"] = self._cf_model_views(frame)
        seg_result = self.segmenter.perform(
            frame, prep.levels[0]["vmap"], prep.levels[0]["nmap"],
            ids, infos, self._get_next_model_id(False), allow_new, **kw,
        )
        seg_mask_np = seg_result.full_segmentation
        self.last_segmentation = seg_mask_np

        # -------- claim phantom re-spawns (pipelined-only pathology) ------
        # A model spawned at host-time t is invisible to the id projections
        # of the <= pipeline_depth frames that were already dispatched, so
        # their host stages see the same mask component as "unexplained"
        # and would spawn it AGAIN (measured: 4 phantom models on a
        # 2-object scene).  If the would-be-new component overlaps a
        # recently spawned model's spawn-time mask, it IS that model —
        # remap the label instead of spawning.
        if seg_result.has_new_label and self._recent_spawns:
            md = seg_result.model_data[-1]
            sel = seg_result.full_segmentation == md.model_id
            sel_n = int(np.count_nonzero(sel))
            live_ids = {m.model_id for m in self.models}
            claimed = None
            for exp_tick, rid, rmask in self._recent_spawns:
                if tick > exp_tick or rid not in live_ids:
                    continue
                inter = int(np.count_nonzero(sel & rmask))
                if (inter > 0.3 * max(sel_n, 1)
                        or inter > 0.3 * max(int(np.count_nonzero(rmask)),
                                             1)):
                    claimed = rid
                    break
            if claimed is not None:
                seg_result.full_segmentation = np.where(
                    sel, claimed,
                    seg_result.full_segmentation).astype(np.uint8)
                seg_mask_np = seg_result.full_segmentation
                self.last_segmentation = seg_mask_np
                if hasattr(self.segmenter, "remap_new_label"):
                    self.segmenter.remap_new_label(md.model_id, claimed)
                seg_result.has_new_label = False
                nd = seg_result.model_data.pop()
                cd = seg_result.data_for(claimed)
                if cd is not None:
                    cd.is_empty = False
                    cd.pixel_count = nd.pixel_count
        self._recent_spawns = [
            (e, r, m) for (e, r, m) in self._recent_spawns if tick <= e]

        # -------- redetect inactive models (MaskFusion::redetectModels
        #          interface; gutted in the reference :686-689) --------
        if (cfg.enable_redetection and self.inactive_models
                and seg_result.has_new_label):
            md = seg_result.model_data[-1]
            sel = seg_result.full_segmentation == md.model_id
            if sel.any():
                ys, xs = np.where(sel)
                roi = (int(ys.min()), int(xs.min()),
                       int(ys.max()) + 1, int(xs.max()) + 1)
                det = self._redetect(frame, roi)
                if det is not None:
                    # reactivate instead of spawning a new model
                    gp = (self._np_glob_pose if self._np_glob_pose
                          is not None else glob.state.pose)
                    for m in list(self.inactive_models):
                        if m.model_id == det.model_id:
                            self.inactive_models.remove(m)
                            m.prev_pose = gp.copy()
                            m.state = m.state._replace(pose=gp.copy())
                            self.models.append(m)
                            if hasattr(self.segmenter, "remap_new_label"):
                                self.segmenter.remap_new_label(
                                    md.model_id, m.model_id)
                            seg_result.has_new_label = False
                            seg_result.full_segmentation = np.where(
                                sel, m.model_id,
                                seg_result.full_segmentation
                            ).astype(np.uint8)
                            seg_mask_np = seg_result.full_segmentation
                            self.last_segmentation = seg_mask_np
                            break

        # -------- spawn new model (:314-332) --------
        if seg_result.has_new_label:
            new_id = self._get_next_model_id(True)
            md = seg_result.model_data[-1]
            # spawn pose starts at the camera pose; static offset is
            # identity at spawn (makeStatic, Model.h:264 with pose=I
            # relative to camera)
            gp = np.asarray(self._np_glob_pose
                            if self._np_glob_pose is not None
                            else glob.state.pose)
            # initialise the newborn map from the spawn frame's masked
            # pixels (FeedbackBuffer + Model::initialise semantics,
            # Model.cpp:240-285).  The reference fuses the spawn frame into
            # the new model synchronously the same frame; the async
            # pipeline can't, so the first-fuse weight boost (100, mirrors
            # the fuse dispatch's !fused_once multiplier) rides the
            # initialisation instead — the newborn clears GlobalProjection's
            # conf-12 gate immediately, the segmenter can match its mask
            # from the next frame on, and no phantom re-spawns fire while
            # the first fuse is still in flight.
            spawn_seg = jnp.asarray(seg_result.full_segmentation)
            new_state = self._init_map(
                prep, rgb, spawn_seg, jnp.uint8(new_id),
                jnp.asarray(gp.astype(np.float32)), float(tick),
                cfg.object_surfel_capacity, weighting=100.0)
            new_model = Model(
                model_id=new_id,
                state=new_state,
                class_id=md.class_id,
                conf_threshold=cfg.conf_threshold_object,
                max_depth=md.depth_mean + 1.2 * md.depth_std,
                is_static=True,
                initial_c2w_inv=np.eye(4, dtype=np.float32),
                # exact host-side count: the masked-pixel surfels (avoids a
                # blocking device count fetch in pipelined mode)
                count_est=int(md.pixel_count or 0),
            )
            new_model.prev_pose = gp.copy()
            self.models.append(new_model)
            for cb in self.new_model_listeners:
                cb(new_model)
            self.spawn_offset = 0
            # remember the spawn-time mask: host stages of the frames
            # already in flight (dispatched BEFORE this spawn, so their id
            # projections cannot contain the new model) would otherwise
            # re-spawn the same region as a phantom model — the claim block
            # above remaps those components back to this model instead
            self._recent_spawns.append(
                (tick + int(cfg.pipeline_depth) + 2, new_id,
                 seg_mask_np == new_id))

            if cfg.spawn_subtraction:
                # eraseErrorGeometry (MaskFusion.cpp:355-358): carve
                # global surfels lying on the spawned object's surface.
                # The carve uses the SPAWN FRAME's world pose `gp` (same
                # as init_map above): glob.state.pose is the newest
                # dispatched frame's pose — up to pipeline_depth frames
                # ahead in prefused mode — and would misregister the carve
                # against the spawn frame's seg/depth under camera motion.
                gmap, _erased = self._erase_error(
                    glob.state.map, jnp.asarray(seg_mask_np),
                    jnp.uint8(new_id), prep.filt_depth,
                    jnp.asarray(gp.astype(np.float32)),
                    bucket=self._bucket_for(glob),
                )
                glob.state = glob.state._replace(map=gmap)

        # per-model maxDepth + confidence ramp (:334-374)
        for model in self.models[1:]:
            md = seg_result.data_for(model.model_id)
            if md is not None and not md.is_empty:
                model.max_depth = md.depth_mean + 1.2 * md.depth_std
                model.unseen_count = 0
            else:
                model.unseen_count += 1
            model.conf_threshold = min(4.5, model.age / 25.0)
        self._update_windows(seg_mask_np)
        return seg_mask_np

    def _dispatch_fuse(self, prep, rgb, seg_mask_np, tick: int,
                       do_fuse: bool, seg_tick: "int | None" = None):
        """fuse + clean + predict dispatch for all models
        (MaskFusion.cpp:539-569).  Object models go through ONE vmapped
        dispatch when capacities match (the reference loops sequentially).
        `seg_tick` records which frame's segmentation seg_mask_np is (it
        lags `tick` by one under fuse_mask_lag) so the preprocess prev_seg
        cache stays frame-accurate."""
        cfg = self.cfg
        seg_mask = jnp.asarray(seg_mask_np)
        parity = (tick % 2 if cfg.fuse_subsample_checkerboard else None)
        fuse_models = list(self.models) if do_fuse else []
        objs = [m for m in fuse_models if m.model_id != 0]
        if (fuse_models and cfg.batch_object_tracking
                and len({m.state.map.capacity for m in objs}) <= 1):
            # ONE dispatch for global + all objects (fused stage)
            glob = fuse_models[0]
            obj_bucket = max((self._bucket_for(m) for m in objs),
                             default=self._tuning.min_bucket_object)
            windowed = (bool(self._obj_window)
                        and bool(objs or cfg.min_object_slots)
                        and all(m.window is not None for m in objs))
            # ONE (n_models,4,4) upload: prev_pose is host numpy in steady
            # state (unpacked from the device stage's hostvec); a freshly
            # spawned model briefly carries a device-array pose — stack
            # through jnp only then
            n_slots = _slot_class(len(objs), cfg.min_object_slots)
            eye = np.eye(4, dtype=np.float32)
            prevs = ([glob.prev_pose] + [m.prev_pose for m in objs]
                     + [eye] * (n_slots - len(objs)))
            if all(isinstance(p, np.ndarray) for p in prevs):
                prev_poses = jnp.asarray(np.stack(prevs))
            else:
                prev_poses = jnp.stack([jnp.asarray(p) for p in prevs])
            param_rows = ([[m.model_id, m.conf_threshold,
                            min(cfg.depth_cutoff, m.max_depth),
                            100.0 if not m.fused_once
                            else cfg.weight_multiplier,
                            (m.window or (0, 0))[0],
                            (m.window or (0, 0))[1]]
                           for m in objs]
                          + [[DEAD_SLOT_ID, 1.0, cfg.depth_cutoff, 1.0,
                              0, 0]] * (n_slots - len(objs)))
            obj_params = jnp.asarray(np.asarray(
                param_rows, np.float32).reshape(n_slots, 6))
            obj_states = self._padded_obj_states(objs, n_slots)
            lf_args = (glob.state, obj_states, prep, rgb,
                       seg_mask, prev_poses, float(tick), obj_params)
            lf_statics = dict(glob_bucket=self._bucket_for(glob),
                              obj_bucket=obj_bucket,
                              parity=parity, windowed=windowed)
            self._note_prewarm("fuse_stage_lag", self._pipelined_fuse_stage,
                               lf_args, lf_statics)
            new_glob, new_objs = self._pipelined_fuse_stage(
                *lf_args, **lf_statics)
            glob.state = new_glob
            for m, s in zip(objs, new_objs):
                m.state = s
                m.fused_once = True
            self._refresh_dummies(objs, obj_states, new_objs)
            self._seg_dev = (seg_tick if seg_tick is not None else tick,
                             seg_mask)
            return
        batch_objs = (len(objs) >= 2 and cfg.batch_object_tracking
                      and len({m.state.map.capacity for m in objs}) == 1)
        for model in fuse_models:
            if batch_objs and model.model_id != 0:
                continue
            is_new = not model.fused_once and model.model_id != 0
            wm = 100.0 if is_new else cfg.weight_multiplier
            conf_t = (cfg.conf_threshold_global if model.model_id == 0
                      else model.conf_threshold)
            max_d = (cfg.depth_cutoff if model.model_id == 0
                     else min(cfg.depth_cutoff, model.max_depth))
            model.state, removed, _appended = self._fuse_clean_predict(
                model.state, prep, rgb, seg_mask,
                jnp.asarray(model.prev_pose),
                float(tick), jnp.uint8(model.model_id),
                float(conf_t), float(max_d), float(wm),
                allow_fill_in=(model.model_id == 0),
                bucket=self._bucket_for(model),
                parity=parity,
            )
            model.fused_once = True
        if batch_objs:
            bucket = max(self._bucket_for(m) for m in objs)
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                                   *[m.state for m in objs])
            new_states, _removed, _appended = (
                self._fuse_clean_predict_batched(
                    stacked, prep, rgb, seg_mask,
                    jnp.stack([jnp.asarray(m.prev_pose) for m in objs]),
                    float(tick),
                    jnp.asarray([m.model_id for m in objs], jnp.uint8),
                    jnp.asarray([m.conf_threshold for m in objs],
                                jnp.float32),
                    jnp.asarray([min(cfg.depth_cutoff, m.max_depth)
                                 for m in objs], jnp.float32),
                    jnp.asarray([100.0 if not m.fused_once else
                                 cfg.weight_multiplier for m in objs],
                                jnp.float32),
                    bucket=bucket, parity=parity,
                ))
            for i, m in enumerate(objs):
                m.state = jax.tree.map(lambda x, i=i: x[i], new_states)
                m.fused_once = True

    def _dispatch_fuse_prefused(self, prep, rgb, seg_dev, tick: int,
                                prev_poses_dev, gate, glob, objs,
                                glob_bucket: int, obj_bucket: int,
                                windowed: bool, ids_guard=None,
                                n_slots: "int | None" = None):
        """Prefused-pipeline fuse dispatch: rides the device queue right
        behind the same frame's device stage.  prev_poses (pre-track poses,
        row 0 global) and the tracking-ok gate are device outputs of that
        stage — the host supplies only the per-model scalars (lagged
        lifecycle state, uploaded async)."""
        cfg = self.cfg
        if n_slots is None:
            n_slots = len(objs)
        parity = (tick % 2 if cfg.fuse_subsample_checkerboard else None)
        param_rows = ([[m.model_id, m.conf_threshold,
                        min(cfg.depth_cutoff, m.max_depth),
                        100.0 if not m.fused_once else cfg.weight_multiplier,
                        (m.window or (0, 0))[0], (m.window or (0, 0))[1]]
                       for m in objs]
                      + [[DEAD_SLOT_ID, 1.0, cfg.depth_cutoff, 1.0, 0, 0]]
                      * (n_slots - len(objs)))
        obj_params = jnp.asarray(np.asarray(
            param_rows, np.float32).reshape(n_slots, 6))
        obj_states = self._padded_obj_states(objs, n_slots)
        fs_args = (glob.state, obj_states, prep, rgb,
                   seg_dev, prev_poses_dev, float(tick), obj_params)
        fs_statics = dict(glob_bucket=glob_bucket, obj_bucket=obj_bucket,
                          parity=parity, windowed=windowed)
        # gate/ids_guard are TRACED args recorded by keyword (they sit after
        # the static params in the signature, so positional capture would
        # misbind them onto glob_bucket/obj_bucket at lower() time)
        self._note_prewarm("fuse_stage", self._pipelined_fuse_stage,
                           fs_args,
                           {**fs_statics, "gate": gate,
                            "ids_guard": ids_guard})
        new_glob, new_objs = self._pipelined_fuse_stage(
            *fs_args,
            glob_bucket=glob_bucket, obj_bucket=obj_bucket,
            parity=parity, windowed=windowed, gate=gate,
            ids_guard=ids_guard)
        glob.state = new_glob
        self._refresh_dummies(objs, obj_states, new_objs)
        # first-fuse bookkeeping is provisional here: the device-side gate
        # may select this whole fuse away (tracking failed), in which case
        # the newborn never actually received the 100x first-fuse weight
        # multiplier (computeFusionWeight's !fused_once path).  _finish_one
        # reads the same frame's covariance from hostvec and RESTORES
        # fused_once=False for these models when the gate was closed.
        first_fused = [m for m in objs if not m.fused_once]
        for m, s in zip(objs, new_objs):
            m.state = s
            m.fused_once = True
        return first_fused

    # --------------------------------------------- pipelined multi-object
    def _track_models_device(self, prep):
        """The tracking block with ZERO host syncs: returns (tracked models,
        stacked jump norms or None, cov-max scalar) as device arrays."""
        cfg = self.cfg
        glob = self.models[0]
        glob_prev_pose = glob.state.pose
        tr = self._track(glob.state, prep, jnp.uint8(0))
        glob.state = glob.state._replace(pose=tr.pose)
        warm = (self._camera_motion(glob_prev_pose, tr.pose)
                if cfg.object_warm_start else None)
        cov = jnp.max(tr.cov_diag)
        trackable = cfg.trackable_classes
        tracked = []
        for model in list(self.models[1:]):
            if (not trackable) or (model.class_id in trackable):
                tracked.append(model)
            else:
                # static objects mirror camera motion (Model.h:263-268)
                model.state = model.state._replace(
                    pose=jnp.asarray(model.initial_c2w_inv)
                    @ glob.state.pose)
        jump_stack = None
        if tracked and (len(tracked) == 1 or not cfg.batch_object_tracking):
            js = []
            for model in tracked:
                trm = self._track(model.state, prep,
                                  jnp.uint8(model.model_id), is_object=True,
                                  warm=warm)
                model.state = model.state._replace(pose=trm.pose)
                js.append(jnp.linalg.norm(trm.delta[:3, 3]))
            jump_stack = jnp.stack(js)
        elif tracked:
            new_poses, jump_norms = self._track_objects(
                jnp.stack([m.state.pose for m in tracked]),
                jnp.stack([m.state.pred_vmap for m in tracked]),
                jnp.stack([m.state.pred_nmap for m in tracked]),
                jnp.stack([m.state.pred_rgb for m in tracked]),
                jnp.stack([m.state.so3_intensity for m in tracked]),
                jnp.asarray([m.model_id for m in tracked], jnp.uint8),
                prep, warm,
            )
            for i, model in enumerate(tracked):
                model.state = model.state._replace(pose=new_poses[i])
            jump_stack = jump_norms
        return tracked, jump_stack, cov

    @staticmethod
    def _start_async_copy(x):
        """Begin a device->host transfer without blocking (supported on all
        jax backends; harmless no-op when unavailable)."""
        try:
            x.copy_to_host_async()
        except Exception:
            pass

    @staticmethod
    def _record_ready(P) -> bool:
        """True when every device->host transfer the record's host stage
        consumes has completed (non-blocking poll)."""
        try:
            for key in ("hostvec", "ids", "nonedge", "cov", "jumps",
                        "counts"):
                x = P.get(key)
                if x is not None and not x.is_ready():
                    return False
            return True
        except AttributeError:      # backend without is_ready: never defer
            return True

    def _drain_ready_pipe(self):
        """Run host stages for every pending frame whose prefetched device
        results are ready; force a BLOCKING drain only when the pipeline is
        deeper than cfg.pipeline_depth (bounds lifecycle lag)."""
        depth = max(1, int(self.cfg.pipeline_depth))
        while self._pending:
            if len(self._pending) < depth and not self._record_ready(
                    self._pending[0]):
                break
            self._finish_one(self._pending.popleft())

    def _pipelined_step(self, frame: FrameData, t0: float) -> Dict:
        """Software-pipelined multi-object frame (SURVEY §3.3 hard part 6
        applied to the WHOLE host stage, not just Mask R-CNN).

        Two schedules:
        - fuse_mask_lag=False (exact): depth-1 pipeline — frame t-1's host
          work (segmentation, lifecycle, fuse dispatch with seg(t-1)) runs
          now, then frame t's device work is dispatched.  The reference's
          dataflow is preserved exactly; lifecycle decisions land one frame
          later.
        - fuse_mask_lag=True (prefused, default): frame t's fuse is
          dispatched back to back with its device stage, gated device-side
          by the same frame's tracking covariance and using the NEWEST
          device-resident segmentation; host stages drain lazily as their
          prefetched results become ready (forced beyond pipeline_depth).
          Zero blocking host syncs per frame in steady state — the frame
          rate is set by device compute even when a round trip to the
          device costs many frame times (remote transports), at the price
          of segmentation/lifecycle lagging by up to pipeline_depth frames
          (the reference tolerates 30 frames of mask lag by design,
          MainController.cpp:223)."""
        cfg = self.cfg
        self._pipelined_active = True
        # rgb_only is static config: fusion must NEVER run (the reference
        # gates on `!rgbOnly && trackingOk && !lost`, MaskFusion.cpp:539).
        # The prefused schedule would dispatch fuse unconditionally with
        # only the covariance gate, so rgb_only forces the lagfuse schedule
        # whose host-side do_fuse honours it.  self.lost is unreachable
        # here: pipelining requires ferns is None, and lost is only ever
        # set by the relocalisation branch.
        prefused = bool(cfg.fuse_mask_lag) and not cfg.rgb_only
        # ---- host stage(s): finish frames whose results arrived ----
        if prefused:
            self._drain_ready_pipe()
        elif self._pending:
            self._finish_one(self._pending.popleft())

        # ---- device stage: frame t ----
        rgb = jnp.asarray(frame.rgb)
        depth = jnp.asarray(frame.depth)   # u16 mm stays raw (preprocess
        if depth.dtype not in (jnp.uint16, jnp.float32):  # converts)
            depth = depth.astype(jnp.float32)
        seg_cache = getattr(self, "_seg_dev", None)
        if (seg_cache is not None and self.last_segmentation is not None
                and (prefused or seg_cache[0] == self.tick - 1)):
            # newest device-resident seg (prefused: host stages re-upload
            # after each segmentation, so the cache IS the newest; exact
            # mode insists on seg(t-1))
            prev_seg = seg_cache[1]
        else:
            prev_seg = jnp.asarray(
                self.last_segmentation
                if self.last_segmentation is not None
                else np.zeros((self.res.height, self.res.width), np.uint8))
            if self.last_segmentation is not None:
                # the lagged fuse dispatch in _finish_one reuses this
                # device copy instead of re-uploading the same mask
                self._seg_dev = (self.tick - 1, prev_seg)
        glob = self.models[0]
        objs = self.models[1:]
        trackable = cfg.trackable_classes
        fused_ok = (
            not trackable
            or all(m.class_id in trackable for m in objs)
        ) and len({m.state.map.capacity for m in objs}) <= 1
        # schedule transition (e.g. a non-trackable-class model appeared):
        # drain ALL pending records first, so a lagfuse frame t's fuse can
        # never be dispatched AFTER frames t+1..t+k's prefused fuses —
        # fuse dispatch order stays monotonic in tick and the device
        # `time` argument that time-based cleaning consumes never regresses
        new_kind = "prefused" if (prefused and fused_ok) else "lagfuse"
        if self._pending and self._pending[-1]["kind"] != new_kind:
            self.drain_pipeline()
        if fused_ok:
            # ONE dispatch for the whole pre-segmentation device stage;
            # prev_pose bookkeeping and pose logging ride the hostvec
            # (unpacked in _finish_one) — no per-model device copies here
            glob_bucket = self._bucket_for(glob)
            obj_bucket = max((self._bucket_for(m) for m in objs),
                             default=self._tuning.min_bucket_object)
            # object-axis size class: spawns/deletes within a class reuse
            # the compiled graphs (dead slots carry DEAD_SLOT_ID and an
            # empty map; their lanes are select-sanitised device-side)
            n_slots = _slot_class(len(objs), cfg.min_object_slots)
            windowed = bool(n_slots and self._obj_window) and all(
                m.window is not None for m in objs)
            aux_rows = ([[m.model_id, (m.window or (0, 0))[0],
                          (m.window or (0, 0))[1]] for m in objs]
                        + [[DEAD_SLOT_ID, 0, 0]] * (n_slots - len(objs)))
            obj_aux = jnp.asarray(np.asarray(
                aux_rows, np.float32).reshape(n_slots, 3))
            ids_vec = ([m.model_id for m in self.models]
                       + [0] * (n_slots - len(objs)))
            with self.stopwatch.scope("odom"):
                ds_args = (glob.state, self._padded_obj_states(objs, n_slots),
                           obj_aux, jnp.asarray(ids_vec, jnp.float32),
                           rgb, depth, prev_seg, float(self.tick))
                ds_statics = dict(glob_bucket=glob_bucket,
                                  obj_bucket=obj_bucket, windowed=windowed)
                self._note_prewarm("device_stage",
                                   self._pipelined_device_stage,
                                   ds_args, ds_statics)
                (prep, gpose, oposes, hostvec, ids_dev, nonedge_dev,
                 prev_poses_dev, okf) = self._pipelined_device_stage(
                    *ds_args, **ds_statics)
            glob.state = glob.state._replace(pose=gpose)
            for m, p in zip(objs, oposes):
                m.state = m.state._replace(pose=p)
            tracked = list(objs)
            for x in (ids_dev, nonedge_dev, hostvec):
                self._start_async_copy(x)
            first_fused = []
            if prefused:
                # fuse(t) rides the device queue immediately: newest
                # device-resident seg (guarded by the same-frame id
                # projection) + device-side tracking-ok gate
                with self.stopwatch.scope("fuse"):
                    first_fused = self._dispatch_fuse_prefused(
                        prep, rgb, prev_seg, self.tick, prev_poses_dev,
                        okf, glob, objs, glob_bucket, obj_bucket, windowed,
                        ids_guard=ids_dev, n_slots=n_slots)
            self._pending.append(dict(
                kind="prefused" if prefused else "lagfuse",
                frame=frame, prep=prep, rgb=rgb, ids=ids_dev,
                nonedge=nonedge_dev, hostvec=hostvec,
                tracked=tracked, tick=self.tick,
                first_fused=first_fused, n_slots=n_slots,
                count_models=list(self.models)))
        else:
            for model in self.models:
                model.prev_pose = model.state.pose.copy()
            with self.stopwatch.scope("Preprocess"):
                prep = self._preprocess(rgb, depth, prev_seg)
            with self.stopwatch.scope("odom"):
                tracked, jump_stack, cov = self._track_models_device(prep)
            with self.stopwatch.scope("projection"):
                ids_dev = self._project_ids_all(float(self.tick))
                _edge_dev, nonedge_dev = self.segmenter._edge_binary(
                    prep.levels[0]["vmap"], prep.levels[0]["nmap"])
            counts = jnp.stack([m.state.map.count for m in self.models])
            for x in (ids_dev, nonedge_dev, cov, jump_stack, counts):
                if x is not None:
                    self._start_async_copy(x)
            self._pending.append(dict(
                kind="lagfuse",
                frame=frame, prep=prep, rgb=rgb, ids=ids_dev,
                nonedge=nonedge_dev, cov=cov,
                jumps=jump_stack, tracked=tracked, tick=self.tick,
                counts=counts, count_models=list(self.models)))
            self._log_poses(frame)
        out = {
            "tick": self.tick, "n_models": len(self.models),
            "model_ids": [m.model_id for m in self.models],
            "tracking_ok": self._last_tracking_ok,
            "surfels": self._last_count,
            "pipelined": True,
        }
        self.stopwatch.record("Run", (_time.perf_counter() - t0) * 1000)
        return out

    def _finish_one(self, P):
        """Host stage for one pending frame: fetch prefetched device
        results, segment, update lifecycle, and (lagfuse records only)
        dispatch fuse — prefused records dispatched theirs at enqueue."""
        cfg = self.cfg
        tick = P["tick"]
        models = P["count_models"]
        n = len(models)
        n_obj = n - 1
        if P.get("hostvec") is not None:
            # ONE blocking read for every per-frame host-bound scalar:
            # counts, cov, jumps, prev poses, world poses (separate small
            # np.asarray fetches measured ~57 ms EACH on the remote
            # transport; the packed async-copied vector fetches in ~0)
            with self.stopwatch.scope("fetch"):
                hv = np.asarray(P["hostvec"])
            # hostvec layout follows the PADDED object axis (dead slots at
            # the end of each section); only the live prefix is consumed
            ns = P.get("n_slots", n_obj)
            N = 1 + ns
            counts = hv[:n]
            cov = float(hv[N])
            jumps = hv[N + 1:N + 1 + n_obj] if n_obj else None
            p0 = N + 1 + ns
            prev_poses = hv[p0:p0 + 16 * N].reshape(N, 4, 4)[:n]
            world_poses = hv[p0 + 16 * N:p0 + 32 * N].reshape(N, 4, 4)[:n]
            ts = P["frame"].timestamp or float(tick)
            for i, model in enumerate(models):
                model.prev_pose = prev_poses[i]
                model.pose_log.append({
                    "timestamp": ts, "tick": tick,
                    "pose": world_poses[i].copy(),
                })
            self._np_glob_pose = world_poses[0]
        else:
            with self.stopwatch.scope("fetch"):
                counts = np.asarray(P["counts"])
            cov = float(np.asarray(P["cov"]))
            jumps = (np.asarray(P["jumps"])
                     if P["jumps"] is not None else None)
        for model, c in zip(models, counts):
            model.count_est = int(c)
        if models:
            self._last_count = int(counts[0])
        tracking_ok = cov <= self._cov_thresh
        self._last_tracking_ok = tracking_ok
        if not tracking_ok:
            # the prefused fuse of THIS frame was gated away device-side;
            # restore the first-fuse weight boost for newborns whose first
            # fuse landed on it (the boost applies on the actual first
            # applied fuse, Model::computeFusionWeight semantics)
            for m in P.get("first_fused") or []:
                if m in self.models:
                    m.fused_once = False
        if jumps is not None:
            for model, jump in zip(P["tracked"], jumps):
                if (float(jump) > cfg.model_deactivate_jump
                        and model in self.models):
                    self._inactivate_model(model, "movement")
        prefused = P.get("kind") == "prefused"
        do_fuse = tracking_ok and not self.lost and not cfg.rgb_only
        # fuse_mask_lag (lagfuse records): dispatch fuse(t) NOW with
        # seg(t-1) so the device chews on it while the host segments frame
        # t.  Prefused records dispatched fuse(t) at enqueue time with the
        # then-newest seg and a device-side tracking gate — nothing to do.
        lag = (not prefused and cfg.fuse_mask_lag
               and self.last_segmentation is not None)
        if lag:
            seg_for_fuse = self.last_segmentation
            sc = getattr(self, "_seg_dev", None)
            if sc is not None and sc[0] == tick - 1:
                seg_for_fuse = sc[1]   # already on device (preprocess's
                                       # prev_seg upload) — skip re-upload
            with self.stopwatch.scope("fuse"):
                self._dispatch_fuse(P["prep"], P["rgb"], seg_for_fuse,
                                    tick, do_fuse, seg_tick=tick - 1)
        with self.stopwatch.scope("fetch_ids"):
            ids = np.asarray(P["ids"])
        with self.stopwatch.scope("segmentation"):
            seg_mask_np = self._segment_and_update_models(
                P["frame"], P["prep"], P["rgb"], ids,
                nonedge=P["nonedge"], tick=tick)
        if prefused:
            # stage the fresh seg in HBM for the NEXT device/fuse dispatches
            # (async upload; preprocess and fuse read whatever is newest)
            self._seg_dev = (tick, jax.device_put(seg_mask_np))
        elif not lag:
            with self.stopwatch.scope("fuse"):
                self._dispatch_fuse(P["prep"], P["rgb"], seg_mask_np, tick,
                                    do_fuse)
        self._np_glob_pose = None
        for model in self.models:
            model.age += 1
        if self._diag_exporter:
            self._diag_exporter.record(
                self, {"tracking_ok": tracking_ok,
                       "surfels": self.models[0].count_est},
                P["prep"].levels[0]["vmap"])

    def drain_pipeline(self):
        """Finish ALL pending pipelined frames (call after the last
        process_frame of a stream, and before inspecting map state)."""
        pending = getattr(self, "_pending", None)
        while pending:
            self._finish_one(pending.popleft())

    def _note_prewarm(self, name: str, jfn, args: tuple, statics: dict):
        """Record a bucket-keyed dispatch's arg SHAPES (ShapeDtypeStructs,
        no buffers retained) so prewarm_next_buckets can AOT-compile the
        same graph at future bucket rungs."""
        def sds(x):
            if hasattr(x, "shape") and hasattr(x, "dtype"):
                return jax.ShapeDtypeStruct(x.shape, x.dtype)
            return x

        self._prewarm_ex[name] = (
            jfn, jax.tree_util.tree_map(sds, args),
            {k: jax.tree_util.tree_map(sds, v) for k, v in statics.items()})

    def prewarm_next_buckets(self, rungs: int = 1, quiet: bool = True,
                             budget_s: "float | None" = None,
                             _lower_only: bool = False) -> int:
        """AOT-compile the bucket-keyed frame graphs at the next `rungs`
        bucket step(s) above the last dispatch.

        A growing map crossing a bucket rung mid-stream recompiles the
        whole fused frame graph — 90-230 s per variant over the remote
        transport (CLAUDE.md round-4 finding), which lands as a multi-
        second stall in a live window or poisons a timed bench.  This
        compiles those variants ahead of time from the recorded dispatch
        shapes via ``jit.lower(...).compile()`` — nothing executes, no
        engine state changes, and the persistent compile cache keeps the
        executables across processes.  Bucket-capacity arg shapes do not
        change with the bucket (the graphs take the full-capacity map and
        slice ``prefix_view(map, bucket)`` internally), so only the static
        bucket/parity/compact arguments vary.

        The reference never recompiles at run time (fixed-size CUDA/GL
        buffers, Core/CMakeLists.txt:27 capacities); this is the XLA-world
        equivalent of that guarantee for the steady state.  `budget_s`
        bounds the wall-clock spent (variants are ordered most-likely-
        needed first, so a cold cache spends the budget on the rungs
        growth actually reaches; a warm cache completes in seconds).
        Returns the number of graph variants compiled (persistent-cache
        hits included).
        """
        cfg = self.cfg
        if not self.models:
            return 0
        t_end = (None if budget_s is None
                 else _time.perf_counter() + max(0.0, budget_s))
        glob_cap = self.models[0].state.map.capacity
        obj_cap = next((m.state.map.capacity for m in self.models[1:]),
                       cfg.object_surfel_capacity)
        parities = ((0, 1) if cfg.fuse_subsample_checkerboard else (None,))

        def rung_seq(b, cap, pow2):
            out, cur = [], int(b)
            for _ in range(rungs):
                nxt = min(cur + (cur if pow2 else cur >> 2), cap)
                if nxt == cur:
                    break
                out.append(nxt)
                cur = nxt
            return out

        # Flat work list ORDERED most-likely-needed first, so a wall-clock
        # budget (cold caches: each variant is a full remote compile) spends
        # itself on the rungs growth actually reaches: for each rung step,
        # single-axis variants of every captured graph come before any
        # cross-axis (both-buckets-grew-simultaneously) combination.
        work = []       # (priority, name, jfn, args, statics)
        for name, (jfn, args, kw) in self._prewarm_ex.items():
            if name == "static_step":
                # quarter-octave global rungs x both checkerboard parities
                # x both compaction variants (the DIAG_INTERVAL frame)
                for i, b in enumerate(rung_seq(kw["bucket"], glob_cap,
                                               False)):
                    for p in parities:
                        for c in (False, True):
                            work.append((i, name, jfn, args,
                                         {**kw, "bucket": b, "parity": p,
                                          "compact": c}))
            else:
                # multi-object path: pow2 rungs on both axes (engine
                # _bucket_for uses pow2 steps for every model here)
                gb, ob = kw["glob_bucket"], kw["obj_bucket"]
                grungs = rung_seq(gb, glob_cap, True)
                orungs = rung_seq(ob, obj_cap, True)
                combos = (
                    [(i, g, ob) for i, g in enumerate(grungs)]
                    + [(i, gb, o) for i, o in enumerate(orungs)]
                    + [(rungs + i + j, g, o)
                       for i, g in enumerate(grungs)
                       for j, o in enumerate(orungs)])
                for pri, g, o in combos:
                    base = {**kw, "glob_bucket": g, "obj_bucket": o}
                    if "parity" in kw:
                        for p in parities:
                            work.append((pri, name, jfn, args,
                                         {**base, "parity": p}))
                    else:
                        work.append((pri, name, jfn, args, base))
        work.sort(key=lambda w: w[0])

        n = 0
        for _pri, name, jfn, args, v in work:
            if t_end is not None and _time.perf_counter() > t_end:
                if not quiet:
                    print(f"prewarm budget exhausted after {n} variants")
                break
            try:
                lowered = jfn.lower(*args, **v)
                if not _lower_only:             # tests validate arg binding
                    lowered.compile()           # via lowering alone (cheap)
                n += 1
            except Exception as e:              # pragma: no cover - defensive
                if not quiet:
                    print(f"prewarm {name} {v}: {e!r}")
        return n

    # class-level fallback; overridden per instance from the DeviceTuning
    # registry (utils/tuning.py) at construction
    DIAG_INTERVAL = 8

    def flush_diagnostics(self):
        """Fetch the most recent fused-step diagnostics (one round trip).
        In pipelined multi-object mode, also finishes the pending frame."""
        self.drain_pipeline()
        if self._pending_diag is None:
            return {}
        (icp_err, icp_cnt, rgb_cnt, cov_max, count, removed,
         appended) = jax.device_get(self._pending_diag)
        self._pending_diag = None
        self._last_count = int(count)
        # append-rate estimate for between-flush bucket sizing: the LAST
        # frame's actual appends with a floor (a burst can double frame to
        # frame; the 1.5x margin + choose_bucket headroom absorb that)
        self._append_rate = max(float(appended) * 1.5, 4096.0)
        self._frames_since_flush = 0
        glob = self.models[0] if self.models else None
        if glob is not None and glob.last_bucket and (
                self._last_count + self._tuning.headroom_global
                > glob.last_bucket):
            # flush shows the count near the bucket ceiling: pump the
            # bucket up a step now rather than risk clamped appends
            glob.last_bucket = sm.choose_bucket(
                self._last_count + 131072, glob.state.map.capacity,
                current=glob.last_bucket)
        self._last_tracking_ok = bool(cov_max <= self._cov_thresh)
        return {
            "surfels": int(count), "icp_error": float(icp_err),
            "icp_count": float(icp_cnt), "rgb_count": float(rgb_cnt),
            "removed": int(removed), "tracking_ok": self._last_tracking_ok,
        }

    def _fern_views(self, glob: "Model"):
        """1/8-scale fill-in views for the fern DB (ferns use GPUResize on
        the fill-in textures, MaskFusion.cpp:430-432, 609-614).

        Downsampled ON DEVICE before the host fetch: the previous host-side
        striding downloaded three full VGA maps (~3.5 MB) every fern frame;
        the 1/8-scale views are ~55 KB (ferns run at 1/8 scale precisely to
        be cheap, Ferns.cpp:56-109)."""
        f = self.ferns.factor
        if not hasattr(self, "_fern_small_jit"):
            @jax.jit
            def small(rgb, vm, nm):
                return (jnp.clip(rgb[::f, ::f], 0, 255).astype(jnp.uint8),
                        jnp.nan_to_num(vm[::f, ::f], nan=0.0),
                        jnp.nan_to_num(nm[::f, ::f], nan=0.0))

            self._fern_small_jit = small
        rgb_s, vm_s, nm_s = self._fern_small_jit(
            glob.state.pred_rgb, glob.state.pred_vmap, glob.state.pred_nmap)
        return np.asarray(rgb_s), np.asarray(vm_s), np.asarray(nm_s)

    def _apply_loop_closure(self, glob: "Model", res) -> bool:
        """Local loop closure: deformation-graph optimisation over the fern
        constraints, accepted on the reference's thresholds
        (Deformation::constrain, Deformation.cpp:75-180)."""
        from maskfusion_tpu.reloc.deformation import DeformationGraph

        n = glob.surfel_count
        if n < 100 or not res.constraints:
            return False
        # node sampling (Deformation::sampleGraphModel semantics: systematic
        # stride in init-time order, <=1024 nodes) WITHOUT downloading the
        # map: only init_time[:n] (4 bytes/surfel) and the 1024 sampled
        # node positions cross the wire.
        times = np.asarray(glob.state.map.init_time[:n])
        max_nodes = self.cfg.deformation_max_nodes
        order = np.argsort(times)
        step = max(1, n // max_nodes)
        idx = order[::step][:max_nodes]
        node_pos = np.asarray(
            glob.state.map.pos[jnp.asarray(idx, jnp.int32)])
        graph = DeformationGraph(node_pos, times[idx])
        for c in res.constraints:
            graph.add_constraint(c.source_point, c.target_point)
        total, mean_cons = graph.optimise()
        if not (mean_cons < 0.0003 and total < 0.12):
            return False
        # apply the accepted graph ON DEVICE: the map's pos/normal never
        # round-trip to host (previously 2x full-capacity downloads +
        # uploads per closure; at the 9.4M default that is ~450 MB of wire)
        new_pos, new_norm = graph.apply_to_map_device(
            glob.state.map.pos, glob.state.map.normal, n)
        glob.state = glob.state._replace(map=glob.state.map._replace(
            pos=new_pos, normal=new_norm))
        for fframe in self.ferns.frames:
            fframe.pose = graph.apply_to_pose(fframe.pose)
        return True

    def _log_poses(self, frame: FrameData):
        """TUM-convention pose logging (MaskFusion.cpp:578-602).  Entries
        hold device arrays (copies, since states are donated); exporters
        convert lazily — no per-frame host sync."""
        glob_pose = self.models[0].state.pose
        for i, model in enumerate(self.models):
            if i == 0:
                pose = glob_pose.copy()
            else:
                pose = glob_pose @ se3.pose_inverse(model.state.pose)
            model.pose_log.append({
                "timestamp": frame.timestamp or float(self.tick),
                "tick": self.tick,
                "pose": pose,
            })

    # ------------------------------------------------------------- exports
    @property
    def global_model(self) -> Model:
        return self.models[0]

    @property
    def current_pose(self) -> np.ndarray:
        return np.asarray(self.models[0].state.pose)

    def download_map(self, model_index: int = 0):
        self.drain_pipeline()
        return sm.download(self.models[model_index].state.map)

    def all_models(self) -> List[Model]:
        return self.models + self.inactive_models
