import numpy as np
import pytest

from maskfusion_tpu.camera import Resolution
from maskfusion_tpu.reloc.deformation import DeformationGraph
from maskfusion_tpu.reloc.ferns import Ferns
from tests import synthetic as syn


def small_maps(pose, scene=None):
    """1/2-scale renders standing in for the reference's 1/8-scale frames."""
    from maskfusion_tpu.ops import preprocess as pp
    import jax.numpy as jnp

    if scene is None:
        scene = syn.make_scene()
    pts, cols = scene
    rgb, depth = syn.render(pts, cols, pose, syn.DEFAULT_INTR)
    vmap = np.asarray(pp.create_vmap(jnp.asarray(depth), syn.DEFAULT_INTR, 5.0))
    nmap = np.asarray(pp.create_nmap(jnp.asarray(vmap)))
    vmap = np.nan_to_num(vmap, nan=0.0)
    nmap = np.nan_to_num(nmap, nan=0.0)
    return rgb, vmap, nmap


def make_ferns():
    return Ferns(300, Resolution(syn.W, syn.H), syn.DEFAULT_INTR,
                 max_depth=5.0, factor=1, seed=1)


def test_fern_db_novelty_gating():
    f = make_ferns()
    rgb, vm, nm = small_maps(np.eye(4))
    assert f.add_frame(rgb, vm, nm, np.eye(4), 0, threshold=0.3095)
    # identical frame again -> rejected as not novel
    assert not f.add_frame(rgb, vm, nm, np.eye(4), 1, threshold=0.3095)
    # a very different viewpoint -> accepted
    pose2 = syn.pose_from(np.array([0, 0.3, 0]), np.array([0.4, 0, 0.2]))
    rgb2, vm2, nm2 = small_maps(pose2)
    assert f.add_frame(rgb2, vm2, nm2, pose2, 2, threshold=0.3095)
    assert len(f.frames) == 2


def test_fern_find_frame_recovers_pose():
    f = make_ferns()
    pose0 = np.eye(4, dtype=np.float32)
    rgb, vm, nm = small_maps(pose0)
    assert f.add_frame(rgb, vm, nm, pose0, 0, threshold=0.3095)
    # query from a slightly different pose, old enough for the time gap
    poseq = syn.pose_from(np.array([0.0, 0.004, 0.0]), np.array([0.006, 0, 0]))
    rgbq, vmq, nmq = small_maps(poseq)
    res = f.find_frame(np.eye(4, dtype=np.float32), rgbq, vmq, nmq,
                       time=400, lost=False)
    assert res.pose is not None, "loop closure not accepted"
    t_err = np.linalg.norm(res.pose[:3, 3] - poseq[:3, 3])
    assert t_err < 5e-3, f"recovered pose error {t_err*1000:.1f}mm"
    assert len(res.constraints) > 10


def test_fern_find_rejects_unrelated_scene():
    f = make_ferns()
    rgb, vm, nm = small_maps(np.eye(4))
    f.add_frame(rgb, vm, nm, np.eye(4), 0, threshold=0.3095)
    other = syn.make_scene(seed=5)
    # flip the texture to make it photometrically distinct
    pts, cols = other
    rgb2, vm2, nm2 = small_maps(np.eye(4), scene=(pts, 255 - cols))
    res = f.find_frame(np.eye(4), rgb2, vm2, nm2, time=400, lost=False)
    assert res.pose is None


def test_deformation_identity_when_no_motion():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (400, 3))
    g = DeformationGraph.sample_from_map(pts, np.arange(400), max_nodes=32)
    for i in range(8):
        p = pts[i * 3]
        g.add_constraint(p, p)
    total, mean_cons = g.optimise()
    assert mean_cons < 1e-4
    out = g.apply_to_points(pts)
    np.testing.assert_allclose(out, pts, atol=1e-3)


def test_deformation_rigid_translation():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1, 1, (300, 3))
    g = DeformationGraph.sample_from_map(pts, np.arange(300), max_nodes=24)
    shift = np.array([0.05, -0.02, 0.03])
    for i in range(10):
        p = pts[i * 7]
        g.add_constraint(p, p + shift)
    total, mean_cons = g.optimise()
    assert mean_cons < 5e-3
    out = g.apply_to_points(pts)
    err = np.linalg.norm(out - (pts + shift), axis=1)
    assert np.median(err) < 0.02


def test_deformation_applies_normals_and_pose():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-1, 1, (200, 3))
    g = DeformationGraph.sample_from_map(pts, np.arange(200), max_nodes=16)
    for i in range(6):
        g.add_constraint(pts[i * 5], pts[i * 5] + np.array([0.02, 0, 0]))
    g.optimise()
    normals = np.tile(np.array([0.0, 0.0, 1.0]), (200, 1))
    out, n_out = g.apply_to_points(pts, normals)
    np.testing.assert_allclose(np.linalg.norm(n_out, axis=1), 1.0, atol=1e-6)
    pose = np.eye(4)
    new_pose = g.apply_to_pose(pose)
    R = new_pose[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert np.linalg.norm(new_pose[:3, 3]) > 0.005


def test_engine_relocalisation_recovers_from_lost(tmp_path=None):
    """Engine-level: blind frames cause 'lost'; a revisit triggers fern
    recovery (the -rl path, MaskFusion.cpp:377-443)."""
    import jax.numpy as jnp
    from maskfusion_tpu.config import Config
    from maskfusion_tpu.engine import MaskFusion
    from maskfusion_tpu.frame import FrameData

    cfg = Config(global_surfel_capacity=1 << 16, static_mode=True,
                 use_so3=False, relocalisation=True, close_loops=True)
    eng = MaskFusion(Resolution(syn.W, syn.H), syn.DEFAULT_INTR, cfg)
    pts, cols = syn.make_scene()
    good = syn.render(pts, cols, np.eye(4), syn.DEFAULT_INTR)
    for i in range(2):
        eng.process_frame(FrameData(rgb=good[0], depth=good[1],
                                    timestamp=float(i)))
    assert len(eng.ferns.frames) >= 1
    # blind frames -> covariance explodes -> lost after >10 bad frames
    blind = (np.zeros((syn.H, syn.W, 3), np.uint8),
             np.zeros((syn.H, syn.W), np.float32))
    for i in range(13):
        eng.process_frame(FrameData(rgb=blind[0], depth=blind[1],
                                    timestamp=float(2 + i)))
    assert eng.lost, "engine should be lost after blind frames"
    # revisit the original view far enough in the future for the fern
    # time gap; pose was perturbed while blind
    eng.tick = 400
    d = eng.process_frame(FrameData(rgb=good[0], depth=good[1],
                                    timestamp=400.0))
    t_err = np.linalg.norm(eng.current_pose[:3, 3])
    assert t_err < 0.02, f"recovery pose error {t_err}"
    d = eng.process_frame(FrameData(rgb=good[0], depth=good[1],
                                    timestamp=401.0))
    assert not eng.lost, "should recover after a good frame"


def test_deformation_native_solver_speed():
    """The reference's CHOLMOD-backed deformation solve is effectively
    <50 ms at 1024 nodes (CholeskyDecomp.cpp:31-96); our Eigen
    SimplicialLLT port with cached symbolic analysis must stay in that
    class.  Runs only when the native library compiled with Eigen."""
    import time

    import numpy as np

    from maskfusion_tpu import cpp as native
    from maskfusion_tpu.reloc.deformation import DeformationGraph

    lib = native.load()
    if lib is None or not getattr(lib, "has_chol", False):
        import pytest

        pytest.skip("native Cholesky unavailable")
    rng = np.random.default_rng(0)
    pos = rng.uniform(-1, 1, (100000, 3)).astype(np.float32)
    g = DeformationGraph.sample_from_map(
        pos, np.arange(100000.0), max_nodes=1024)
    for i in range(8):
        p = pos[rng.integers(0, len(pos))]
        g.add_constraint(p, p + rng.normal(0, 0.003, 3))
    g.optimise()                       # warm the symbolic analysis
    t0 = time.perf_counter()
    g.optimise()
    dt = time.perf_counter() - t0
    assert getattr(g, "_chol_handle", None) is not None
    assert dt < 0.30   # generous CI bound; measured ~80 ms on this box


def test_deformation_device_apply_large():
    """apply_to_points routes large batches through the TPU path
    (GEMM-kNN + row-gather blend; copy_unstable.vert:161-341 parity) and
    matches the host path."""
    import numpy as np

    from maskfusion_tpu.reloc.deformation import DeformationGraph

    rng = np.random.default_rng(1)
    pos = rng.uniform(-1, 1, (50000, 3))
    g = DeformationGraph.sample_from_map(
        pos, np.arange(50000.0), max_nodes=256)
    g.add_constraint(pos[5], pos[5] + [0.01, 0.0, 0.0])
    g.optimise(iterations=1)
    nrm = np.tile([0.0, 0.0, 1.0], (len(pos), 1))
    o_d, n_d = g.apply_to_points(pos, nrm)           # auto device path
    o_h, n_h = g._apply_points_host(pos, nrm)
    assert np.abs(o_d - o_h).max() < 1e-5
    assert np.abs(n_d - n_h).max() < 1e-5


def test_deformation_apply_to_map_device():
    """apply_to_map_device deforms the live prefix of device-resident map
    arrays without a host round trip: matches apply_to_points on rows
    < count and leaves dead slots untouched (the engine loop-closure fast
    path, MaskFusion.cpp:423-537 + copy_unstable.vert:161-341)."""
    import jax.numpy as jnp

    from maskfusion_tpu.reloc.deformation import DeformationGraph

    rng = np.random.default_rng(3)
    cap, count = 4096, 3000
    pos = np.zeros((cap, 3), np.float32)
    pos[:count] = rng.uniform(-1, 1, (count, 3))
    nrm = np.zeros((cap, 3), np.float32)
    nrm[:count] = [0.0, 0.0, 1.0]
    g = DeformationGraph.sample_from_map(
        pos[:count], np.arange(float(count)), max_nodes=64)
    g.add_constraint(pos[7], pos[7] + [0.015, 0.0, 0.0])
    g.optimise(iterations=1)

    pos_d, nrm_d = jnp.asarray(pos), jnp.asarray(nrm)
    new_p, new_n = g.apply_to_map_device(pos_d, nrm_d, count)
    new_p, new_n = np.asarray(new_p), np.asarray(new_n)
    ref_p, ref_n = g.apply_to_points(pos[:count], nrm[:count], device=False)
    assert np.abs(new_p[:count] - ref_p).max() < 1e-5
    assert np.abs(new_n[:count] - ref_n).max() < 1e-5
    # dead slots beyond count are bit-identical to their inputs
    np.testing.assert_array_equal(new_p[count:], pos[count:])
    np.testing.assert_array_equal(new_n[count:], nrm[count:])


def test_engine_close_loops_with_pipelined_config():
    """-rl/close-loops with pipelined_multiobject requested: the engine
    falls back to the synchronous schedule (pipelining requires ferns is
    None — documented fallback) and the run stays healthy."""
    from maskfusion_tpu.config import Config
    from maskfusion_tpu.engine import MaskFusion
    from maskfusion_tpu.frame import FrameData

    cfg = Config(global_surfel_capacity=1 << 16,
                 object_surfel_capacity=1 << 12,
                 seg_method="precomputed", use_so3=False,
                 relocalisation=True, close_loops=True,
                 pipelined_multiobject=True)
    eng = MaskFusion(Resolution(syn.W, syn.H), syn.DEFAULT_INTR, cfg)
    assert eng.ferns is not None
    pts, cols = syn.make_scene()
    rgb, depth = syn.render(pts, cols, np.eye(4), syn.DEFAULT_INTR)
    lab = np.zeros((syn.H, syn.W), np.uint8)
    for i in range(3):
        out = eng.process_frame(FrameData(rgb=rgb, depth=depth, mask=lab,
                                          timestamp=float(i)))
        assert not out.get("pipelined", False)
    assert not eng._pipelined_active
    assert len(eng.ferns.frames) >= 1
    t_err = np.linalg.norm(eng.current_pose[:3, 3])
    assert t_err < 0.01
