"""The MaskFusion segmentation method.

Re-implementation of MfSegmentation (Core/Segmentation/MfSegmentation.cpp):
fuse asynchronous Mask R-CNN instance masks with geometric edge segmentation
and the projected model-ID map into a per-pixel model-ID image.

Split of labour (mirrors the reference's GPU/CPU split, which keeps the CPU
part < 5 ms at 640x480):
  device (jit): geometric edge map -> threshold -> morphology     (ops/seg_ops)
  host (numpy): connected components, edge reassignment, overlap
                bookkeeping, mask->model assignment                (this file)
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from maskfusion_tpu.config import Config
from maskfusion_tpu.frame import FrameData
from maskfusion_tpu.ops import seg_ops
from maskfusion_tpu.segmentation import components as cc
from maskfusion_tpu.segmentation.result import ModelData, SegmentationResult


@dataclasses.dataclass
class ModelInfo:
    """What the segmenter needs to know about a live model."""
    model_id: int
    class_id: int = -1


class MfSegmentation:
    def __init__(self, config: Config, resolution, intrinsics):
        self.cfg = config
        self.res = resolution
        H, W = resolution.height, resolution.width
        self.semantic_ignore = np.zeros((H, W), np.uint8)
        cfg = config

        from maskfusion_tpu.ops import dispatch, pallas_kernels

        @jax.jit
        def edge_binary(vmap, nmap):
            if dispatch.use_pallas(cfg.use_pallas):
                edge = pallas_kernels.geometric_edge_map_pallas(
                    vmap, nmap, cfg.seg_weight_distance,
                    cfg.seg_weight_concavity)
            else:
                edge = seg_ops.geometric_edge_map(
                    vmap, nmap, cfg.seg_weight_distance,
                    cfg.seg_weight_concavity)
            binary = seg_ops.threshold_map(edge, cfg.seg_threshold)
            if cfg.seg_morph_edge_iterations > 0:
                binary = seg_ops.morph_binary(
                    binary, cfg.seg_morph_edge_radius,
                    cfg.seg_morph_edge_iterations,
                )
            return edge, jnp.logical_not(binary)  # inverted: True = non-edge

        self._edge_binary = edge_binary
        self.last_edge_map: Optional[np.ndarray] = None

    def perform(
        self,
        frame: FrameData,
        vmap,                       # (H, W, 3) filtered level-0 vertex map
        nmap,
        projected_ids: np.ndarray,  # (H, W) uint8 from global projection
        models: Sequence[ModelInfo],
        next_model_id: int,
        allow_new: bool,
        edge_nonedge=None,
    ) -> SegmentationResult:
        """`edge_nonedge`, when given, is a precomputed (edge, nonedge)
        host pair from `edge_binary()` — the pipelined engine dispatches the
        device part a frame ahead and prefetches it asynchronously, so
        perform() never blocks on the device (engine pipelined mode)."""
        cfg = self.cfg
        H, W = self.res.height, self.res.width
        total = H * W
        mask = frame.mask if frame.mask is not None else np.zeros((H, W), np.uint8)
        class_ids = list(frame.class_ids or [])
        n_masks = len(class_ids)
        depth = frame.host_depth()

        # ---- device part: edge map -> non-edge binary ----
        if edge_nonedge is None:
            edge, nonedge = self._edge_binary(vmap, nmap)
        else:
            edge, nonedge = edge_nonedge
        self.last_edge_map = np.asarray(edge)
        nonedge = np.asarray(nonedge)

        # ---- person-ignore map (MfSegmentation.cpp:221-235) ----
        if n_masks:
            mask_classes = np.zeros(256, np.int32)
            mask_classes[: len(class_ids)] = class_ids
            is_person = mask_classes[mask] == cfg.person_class_id
            self.semantic_ignore = np.where(is_person, 255, 0).astype(np.uint8)
            nonedge = nonedge & ~is_person
        else:
            nonedge = nonedge & (self.semantic_ignore == 0)

        # ---- connected components + edge reassignment (:239-291) ----
        comp = cc.connected_components(nonedge)
        labels = comp.labels
        if cfg.seg_remove_edges:
            labels = cc.reassign_edge_pixels(
                comp, depth,
                iterations=cfg.seg_edge_reassign_iters,
                depth_delta=cfg.seg_edge_reassign_depth_delta,
                small_threshold=cfg.seg_small_component_threshold,
            )

        n_comp = comp.count
        result = SegmentationResult(
            full_segmentation=np.zeros((H, W), np.uint8)
        )

        model_ids = [m.model_id for m in models]
        id_to_index = np.zeros(256, np.int32)
        for i, mid in enumerate(model_ids):
            id_to_index[mid] = i
        n_models = len(models)
        for m in models:
            result.model_data.append(ModelData(m.model_id, class_id=m.class_id))

        # component-model overlap (:306-308)
        comp_model = np.zeros((n_comp, max(n_models, 1)), np.int64)
        np.add.at(comp_model, (labels.ravel(), id_to_index[projected_ids].ravel()), 1)

        # ---- component <-> mask overlap, 0.65 rule (:310-344) ----
        map_comp_to_mask = np.zeros(n_comp, np.int32)
        mask_pixels = np.zeros(max(n_masks, 1), np.int64)
        mask_boxes = np.full((max(n_masks, 1), 4), [1 << 30, 1 << 30, -1, -1],
                             np.int64)
        if n_masks:
            overlap = np.zeros((n_comp, n_masks), np.int64)
            np.add.at(overlap, (labels.ravel(), mask.ravel().clip(0, n_masks - 1)), 1)
            csizes = np.bincount(labels.ravel(), minlength=n_comp)
            for c in range(1, n_comp):
                if csizes[c] > cfg.seg_min_mapped_component_size:
                    t = 0.65 * csizes[c]
                    for mi in range(1, n_masks):
                        if overlap[c, mi] > t:
                            map_comp_to_mask[c] = mi
                            mask_pixels[mi] += csizes[c]
                            bb = comp.bboxes[c] if c < len(comp.bboxes) else None
                            if bb is not None:
                                mask_boxes[mi, 0] = min(mask_boxes[mi, 0], bb[0])
                                mask_boxes[mi, 1] = min(mask_boxes[mi, 1], bb[1])
                                mask_boxes[mi, 2] = max(mask_boxes[mi, 2], bb[2])
                                mask_boxes[mi, 3] = max(mask_boxes[mi, 3], bb[3])

        seg = map_comp_to_mask[labels].astype(np.uint8)
        seg[self.semantic_ignore > 0] = 255

        if n_masks:
            # morphological closing of masks (:424-426)
            if cfg.seg_morph_mask_iterations > 0:
                from scipy import ndimage

                r = cfg.seg_morph_mask_radius
                y, x = np.ogrid[-r:r + 1, -r:r + 1]
                el = (x * x + y * y) <= r * r
                for _ in range(cfg.seg_morph_mask_iterations):
                    seg = ndimage.grey_dilation(seg, footprint=el)
                    seg = ndimage.grey_erosion(seg, footprint=el)

            # ---- mask -> model assignment (:432-494) ----
            mask_to_id = np.zeros(256, np.uint8)
            for mi in range(1, n_masks):
                if class_ids[mi] == cfg.person_class_id:
                    mask_to_id[mi] = 255

            # overlap of segmentation labels with projected model ids
            model_mask_overlap = np.zeros((n_models, 256), np.int64)
            for b, mid in enumerate(model_ids):
                sel = projected_ids == mid
                if sel.any():
                    model_mask_overlap[b] = np.bincount(
                        seg[sel].ravel(), minlength=256
                    )

            min_new = cfg.seg_min_new_rel * total
            max_new = cfg.seg_max_new_rel * total
            for mi in range(1, n_masks):
                if mask_to_id[mi] == 255:
                    continue
                best_idx, best_overlap = 0, 0
                for j in range(1, n_models):
                    ov = model_mask_overlap[j, mi]
                    if ov > best_overlap:
                        best_overlap, best_idx = ov, j
                best_matches_class = (
                    best_idx != 0
                    and models[best_idx].class_id == class_ids[mi]
                )
                if best_overlap < cfg.seg_min_mask_model_overlap * mask_pixels[mi]:
                    best_idx = 0
                if best_idx != 0 and best_matches_class:
                    mask_to_id[mi] = models[best_idx].model_id
                    md = result.model_data[best_idx]
                    md.is_empty = False
                    md.pixel_count = int(mask_pixels[mi])
                elif (
                    not result.has_new_label and allow_new
                    and min_new < mask_pixels[mi] < max_new and best_idx == 0
                ):
                    mask_to_id[mi] = next_model_id
                    result.has_new_label = True
                    result.new_model_class_id = class_ids[mi]
                    result.model_data.append(ModelData(
                        next_model_id, is_empty=False,
                        pixel_count=int(mask_pixels[mi]),
                        class_id=class_ids[mi],
                    ))
                else:
                    mask_to_id[mi] = 255

            seg = mask_to_id[seg]

        # ---- leftover components -> models by 0.6 overlap (:496-522) ----
        csizes = np.bincount(labels.ravel(), minlength=n_comp)
        for c in range(1, n_comp):
            if map_comp_to_mask[c] == 0 and n_models:
                midx = int(np.argmax(comp_model[c]))
                ov = comp_model[c, midx]
                mid = model_ids[midx]
                if mid > 0 and ov > 0.6 * csizes[c]:
                    seg[labels == c] = mid

        result.full_segmentation = seg

        # per-model depth statistics (SegmentationResult::ModelData)
        for md in result.model_data:
            sel = (seg == md.model_id) & (depth > 0)
            if sel.any():
                md.depth_mean = float(depth[sel].mean())
                md.depth_std = float(depth[sel].std())
                md.pixel_count = int(sel.sum())
                md.is_empty = md.pixel_count == 0
        return result
