"""Multi-chip sharding paths on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from maskfusion_tpu.parallel.mesh import (
    fsdp_param_sharding, make_mesh, shard_pytree_fsdp,
)


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape["dp"] * mesh.shape["mp"] == 8
    mesh1 = make_mesh(2)
    assert mesh1.shape["dp"] == 2 and mesh1.shape["mp"] == 1


def test_fsdp_sharding_picks_divisible_axis():
    mesh = make_mesh(8)  # mp = 2
    s = fsdp_param_sharding(
        mesh, jax.ShapeDtypeStruct((3, 3, 64, 128), jnp.float32))
    assert "mp" in str(s.spec)
    s2 = fsdp_param_sharding(mesh, jax.ShapeDtypeStruct((7,), jnp.float32))
    assert s2.spec == jax.sharding.PartitionSpec()


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_batched_multimodel_tracking_sharded():
    from maskfusion_tpu.parallel.multimodel import (
        BatchedTrackInputs, build_batched_tracker,
    )
    from maskfusion_tpu.ops import preprocess as pp
    from maskfusion_tpu.tracking import odometry as odo
    from tests import synthetic as syn

    intr = syn.DEFAULT_INTR
    pts, cols = syn.make_scene()
    pose = np.eye(4, dtype=np.float32)
    rgb, depth = syn.render(pts, cols, pose, intr)
    filt = pp.bilateral_filter_depth(jnp.asarray(depth))
    levels = pp.build_frame_pyramids(
        filt, pp.rgb_to_intensity(jnp.asarray(rgb)),
        jnp.zeros(depth.shape, jnp.uint8), intr, 5.0, 3)
    frame_pyr = odo.build_frame_pyramids_for_odometry(levels, jnp.asarray(rgb))

    M = 8  # one model per device
    batch = BatchedTrackInputs(
        poses=jnp.tile(jnp.eye(4)[None], (M, 1, 1)),
        pred_vmaps=jnp.tile(levels[0]["vmap"][None], (M, 1, 1, 1)),
        pred_nmaps=jnp.tile(levels[0]["nmap"][None], (M, 1, 1, 1)),
        pred_rgbs=jnp.tile(jnp.asarray(rgb, jnp.float32)[None], (M, 1, 1, 1)),
        mask_ids=jnp.zeros((M,), jnp.uint8),
    )
    mesh = make_mesh(8, axes=("dp",))
    tracker = build_batched_tracker(intr, mesh)
    with mesh:
        poses, deltas, counts = tracker(batch, frame_pyr)
    assert poses.shape == (M, 4, 4)
    # identical inputs at identity motion -> all models return ~identity
    np.testing.assert_allclose(np.asarray(poses[:, :3, 3]), 0.0, atol=5e-4)
    assert np.asarray(counts).min() > 1000
