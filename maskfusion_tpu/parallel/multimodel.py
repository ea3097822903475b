"""Model-axis parallelism for multi-object SLAM.

The SLAM-native scaling axis: stack the per-object tracking problem along a
leading axis and vmap the whole GN solve, sharding that axis over the mesh —
every device tracks a shard of the object models in one SPMD dispatch
(replaces the reference's sequential per-model loop, MaskFusion.cpp:246-278,
and our engine's host loop when many objects are live)."""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from maskfusion_tpu import se3
from maskfusion_tpu.camera import CameraIntrinsics
from maskfusion_tpu.tracking import odometry as odo


class BatchedTrackInputs(NamedTuple):
    """Per-model tensors stacked on a leading 'models' axis."""
    poses: jnp.ndarray          # (M, 4, 4)
    pred_vmaps: jnp.ndarray     # (M, H, W, 3)
    pred_nmaps: jnp.ndarray
    pred_rgbs: jnp.ndarray
    mask_ids: jnp.ndarray       # (M,)


def build_batched_tracker(intr: CameraIntrinsics, mesh: Optional[Mesh] = None,
                          model_axis: str = "dp", **odo_kwargs):
    """Returns a jitted function tracking all M models at once.  With a mesh,
    the model axis is sharded so each device solves its own models' GN
    systems; the frame pyramids are replicated."""

    def track_one(pose, pv, pn, pc, mask_id, frame_pyr):
        model_pyr = odo.build_model_pyramids(pv, pn, pc, pose)
        res = odo.get_incremental_transformation(
            pose[:3, 3], pose[:3, :3], frame_pyr, model_pyr, None, intr,
            use_so3=False, mask_id=mask_id, **odo_kwargs,
        )
        return se3.make_pose(res.R, res.t), res.delta, res.icp_count

    def track_all(batch: BatchedTrackInputs, frame_pyr):
        return jax.vmap(track_one, in_axes=(0, 0, 0, 0, 0, None))(
            batch.poses, batch.pred_vmaps, batch.pred_nmaps,
            batch.pred_rgbs, batch.mask_ids, frame_pyr,
        )

    if mesh is None:
        return jax.jit(track_all)

    model_sh = NamedSharding(mesh, P(model_axis))
    batch_shardings = BatchedTrackInputs(
        poses=model_sh, pred_vmaps=model_sh, pred_nmaps=model_sh,
        pred_rgbs=model_sh, mask_ids=model_sh,
    )
    return jax.jit(
        track_all,
        in_shardings=(batch_shardings, None),
        out_shardings=(model_sh, model_sh, model_sh),
    )
