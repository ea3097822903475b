"""Model-axis parallelism for multi-object SLAM.

The SLAM-native scaling axis: the engine stacks the per-object tracking and
fuse problems along a leading axis and vmaps the whole solve; this module's
`shard_model_axis` places a GSPMD sharding constraint on that axis so every
device tracks+fuses a shard of the object models in one SPMD dispatch
(replaces the reference's sequential per-model loop, MaskFusion.cpp:246-278).

This is THE implementation the engine uses (MaskFusion._shard_model_axis
delegates here) — the same constraint the multichip dryrun
(__graft_entry__._dryrun_slam_model_axis) validates on a virtual mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def shard_model_axis(mesh: Optional[Mesh], axis: str, tree):
    """GSPMD sharding constraint on a leading model-stacked axis: with a
    mesh, each device owns a shard of the object models through the vmapped
    tracking/fuse graphs.  No-op without a mesh, or when the model count
    doesn't tile the mesh axis (GSPMD needs divisibility; odd counts
    replicate, which is always correct)."""
    if mesh is None:
        return tree
    leaves = jax.tree.leaves(tree)
    n = leaves[0].shape[0] if leaves else 0
    size = mesh.shape.get(axis, 1)
    if n == 0 or size <= 1 or n % size:
        return tree
    sh = NamedSharding(mesh, PartitionSpec(axis))
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(x, sh), tree)
