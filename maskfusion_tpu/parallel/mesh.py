"""Device-mesh helpers.

The reference's 'distributed' structure is one SLAM GPU + one NN GPU
(SURVEY.md §2.9).  The TPU-native scaling axes are:
  - dp/fsdp/tp over the Mask R-CNN training/fine-tuning step (this module +
    parallel.train)
  - the model axis of multi-object SLAM: each device tracks/fuses a shard of
    the object models (parallel.multimodel)
Collectives ride ICI via XLA GSPMD — we only annotate shardings.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Tuple[str, ...] = ("dp", "mp"),
              devices: Optional[Sequence] = None) -> Mesh:
    """Factorise available devices into a (dp, mp) mesh: mp gets 2 when the
    device count is even and >2, else 1.

    ``devices`` lets callers pin an explicit device list (e.g.
    ``jax.devices("cpu")`` for the virtual multi-chip dryrun) instead of
    whatever platform the default backend resolved to.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)[:n_devices] if n_devices else list(devices)
    n = len(devices)
    if len(axes) == 1:
        shape = (n,)
    else:
        mp = 2 if n % 2 == 0 and n > 2 else 1
        shape = (n // mp, mp)
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axes[:len(shape)])


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def fsdp_param_sharding(mesh: Mesh, param: jax.ShapeDtypeStruct,
                        axis: str = "mp") -> NamedSharding:
    """Shard the largest dimension divisible by the mesh axis size; replicate
    otherwise (classic FSDP-style weight sharding)."""
    size = mesh.shape[axis]
    if size == 1:
        return NamedSharding(mesh, P())
    shape = param.shape
    candidates = sorted(range(len(shape)), key=lambda i: -shape[i])
    for dim in candidates:
        if shape[dim] % size == 0 and shape[dim] >= size:
            spec = [None] * len(shape)
            spec[dim] = axis
            return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def shard_pytree_fsdp(tree, mesh: Mesh, axis: str = "mp"):
    """Apply fsdp_param_sharding across a parameter pytree."""
    return jax.tree.map(
        lambda p: jax.device_put(
            p, fsdp_param_sharding(
                mesh, jax.ShapeDtypeStruct(p.shape, p.dtype), axis)
        ),
        tree,
    )
