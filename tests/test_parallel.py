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


def test_engine_model_axis_sharded_matches_unsharded():
    """Full engine run with the object-stacked axis sharded over a 2-device
    ("models",) mesh (engine._shard_model_axis inside the pipelined
    tracking/fuse graphs) must reproduce the unsharded run: same models,
    same poses, same surfel counts (GSPMD partitions the vmapped per-object
    work without changing its semantics)."""
    from maskfusion_tpu.camera import Resolution
    from maskfusion_tpu.config import Config
    from maskfusion_tpu.engine import MaskFusion
    from maskfusion_tpu.frame import FrameData
    from jax.sharding import Mesh
    from tests import synthetic as syn

    def run(mesh):
        cfg = Config(
            global_surfel_capacity=1 << 16,
            object_surfel_capacity=1 << 13,
            seg_method="precomputed",
            use_so3=False,
            model_spawn_offset=0,
            pipelined_multiobject=True,
            fuse_mask_lag=False,   # exact schedule: determinism for equality
        )
        eng = MaskFusion(Resolution(syn.W, syn.H), syn.DEFAULT_INTR, cfg,
                         mesh=mesh)
        for i in range(6):
            off = np.array([0.006 * max(0, i - 1), 0.0, 0.0])
            pts, cols, labels = syn.make_scene_with_two_objects(
                off1=off, off2=-off)
            rgb, depth, lab = syn.render(
                pts, cols, np.eye(4, dtype=np.float32), syn.DEFAULT_INTR,
                labels=labels)
            eng.process_frame(FrameData(rgb=rgb, depth=depth, mask=lab,
                                        class_ids=[0, 7, 8],
                                        timestamp=float(i)))
        eng.drain_pipeline()
        return eng

    mesh = Mesh(np.array(jax.devices("cpu")[:2]), ("models",))
    e_ref = run(None)
    e_mesh = run(mesh)
    assert len(e_mesh.models) >= 3      # global + 2 objects: axis tiles mesh
    assert [m.model_id for m in e_mesh.models] == \
           [m.model_id for m in e_ref.models]
    for mm, mr in zip(e_mesh.models, e_ref.models):
        np.testing.assert_allclose(np.asarray(mm.state.pose),
                                   np.asarray(mr.state.pose), atol=5e-5)
        assert abs(mm.surfel_count - mr.surfel_count) <= 2


def test_shard_model_axis_helper():
    """The single shared model-axis sharding implementation (the engine
    delegates to it): divisible counts shard, indivisible ones replicate,
    and values are unchanged either way."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec
    from maskfusion_tpu.parallel.multimodel import shard_model_axis

    mesh = Mesh(np.array(jax.devices("cpu")[:2]), ("models",))
    x = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)

    @jax.jit
    def f(x):
        return shard_model_axis(mesh, "models", x) * 2.0

    y = f(x)
    assert y.sharding == NamedSharding(mesh, PartitionSpec("models"))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 2.0)

    # indivisible count (7 % 2): constraint must be skipped, not crash
    x7 = jnp.ones((7, 4))
    y7 = jax.jit(lambda a: shard_model_axis(mesh, "models", a) + 1.0)(x7)
    np.testing.assert_allclose(np.asarray(y7), 2.0)

    # no mesh: identity
    assert shard_model_axis(None, "models", x) is x
