import numpy as np
import jax.numpy as jnp
import pytest

from maskfusion_tpu.ops import preprocess as pp
from maskfusion_tpu.ops import reduce as red
from maskfusion_tpu.tracking import odometry as odo
from tests import synthetic as syn


def _prep_frame(rgb, depth, intr, mask=None):
    """Frame preprocessing as the engine would do it."""
    filt = pp.bilateral_filter_depth(jnp.asarray(depth))
    gray = pp.rgb_to_intensity(jnp.asarray(rgb))
    if mask is None:
        mask = np.zeros(depth.shape, np.uint8)
    levels = pp.build_frame_pyramids(
        filt, gray, jnp.asarray(mask), intr, depth_cutoff=5.0, num_levels=3
    )
    return levels


def _track(pose_a, pose_b, use_so3=False, rgb_only=False, icp_weight=10.0,
           scene=None):
    intr = syn.DEFAULT_INTR
    if scene is None:
        scene = syn.make_scene()
    pts, cols = scene
    rgb_a, depth_a = syn.render(pts, cols, pose_a, intr)
    rgb_b, depth_b = syn.render(pts, cols, pose_b, intr)

    levels_b = _prep_frame(rgb_b, depth_b, intr)
    frame = odo.build_frame_pyramids_for_odometry(levels_b, jnp.asarray(rgb_b))

    # model side = view A rendered from pose A (perfect prediction)
    levels_a = _prep_frame(rgb_a, depth_a, intr)
    model = odo.build_model_pyramids(
        levels_a[0]["vmap"], levels_a[0]["nmap"], jnp.asarray(rgb_a),
        jnp.asarray(pose_a),
    )
    so3_last = tuple(l["intensity"] for l in levels_a) if use_so3 else None

    res = odo.get_incremental_transformation(
        jnp.asarray(pose_a[:3, 3]), jnp.asarray(pose_a[:3, :3]),
        frame, model, so3_last, intr,
        use_so3=use_so3, rgb_only=rgb_only, icp_weight=icp_weight,
        mask_id=jnp.uint8(0),
    )
    return res


def test_identity_motion():
    pose = np.eye(4, dtype=np.float32)
    res = _track(pose, pose)
    assert float(res.icp_count) > 5000
    np.testing.assert_allclose(np.asarray(res.t), 0.0, atol=2e-4)
    assert syn.rotation_angle_deg(np.asarray(res.R), np.eye(3)) < 0.02


@pytest.mark.parametrize("rvec,tvec", [
    (np.array([0.0, 0.0, 0.0]), np.array([0.01, 0.0, 0.0])),
    (np.array([0.0, 0.015, 0.0]), np.array([0.0, 0.0, 0.0])),
    (np.array([0.01, -0.008, 0.005]), np.array([0.008, -0.006, 0.012])),
])
def test_recovers_known_motion(rvec, tvec):
    pose_a = np.eye(4, dtype=np.float32)
    pose_b = syn.pose_from(rvec, tvec)
    res = _track(pose_a, pose_b)
    t_err = np.linalg.norm(np.asarray(res.t) - pose_b[:3, 3])
    r_err = syn.rotation_angle_deg(np.asarray(res.R), pose_b[:3, :3])
    assert t_err < 3e-3, f"translation error {t_err}"
    # ~0.2 deg is the aliasing floor of the nearest-pixel synthetic renderer
    assert r_err < 0.25, f"rotation error {r_err} deg"


def test_recovers_with_so3_prealign():
    pose_a = np.eye(4, dtype=np.float32)
    pose_b = syn.pose_from(np.array([0.0, 0.03, 0.0]), np.array([0.0, 0.0, 0.0]))
    res = _track(pose_a, pose_b, use_so3=True)
    r_err = syn.rotation_angle_deg(np.asarray(res.R), pose_b[:3, :3])
    assert r_err < 0.2, f"rotation error {r_err} deg"
    assert float(res.so3_count) > 500


def test_icp_only_and_rgb_only():
    pose_a = np.eye(4, dtype=np.float32)
    pose_b = syn.pose_from(np.array([0.0, 0.0, 0.008]), np.array([0.005, 0.0, 0.0]))
    res_icp = _track(pose_a, pose_b, icp_weight=100.0)  # icp only
    t_err = np.linalg.norm(np.asarray(res_icp.t) - pose_b[:3, 3])
    assert t_err < 4e-3
    res_rgb = _track(pose_a, pose_b, rgb_only=True)
    t_err = np.linalg.norm(np.asarray(res_rgb.t) - pose_b[:3, 3])
    assert t_err < 1.5e-2  # photometric-only on aliased synthetic renders


def test_delta_consistency():
    # the returned delta must satisfy: new_pose = prev_pose @ inverse(delta)
    pose_a = np.eye(4, dtype=np.float32)
    pose_b = syn.pose_from(np.array([0.004, 0.0, -0.006]), np.array([0.0, 0.01, 0.0]))
    res = _track(pose_a, pose_b)
    delta = np.asarray(res.delta)
    R_new = np.asarray(res.R)
    t_new = np.asarray(res.t)
    inv = np.linalg.inv(delta)
    np.testing.assert_allclose(pose_a[:3, :3] @ inv[:3, :3], R_new, atol=1e-5)
    np.testing.assert_allclose(pose_a[:3, :3] @ inv[:3, 3] + pose_a[:3, 3], t_new,
                               atol=1e-5)


def test_covariance_small_when_tracking_good():
    pose = np.eye(4, dtype=np.float32)
    res = _track(pose, syn.pose_from(np.zeros(3), np.array([0.005, 0, 0])))
    cov = np.asarray(odo.covariance(res.A))
    assert np.all(np.diag(cov) < 1e-4)  # MaskFusion.cpp:377 threshold
