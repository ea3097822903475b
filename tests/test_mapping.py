import numpy as np
import jax.numpy as jnp

from maskfusion_tpu.camera import CameraIntrinsics
from maskfusion_tpu.mapping import surfel_map as sm
from maskfusion_tpu.ops import preprocess as pp
from maskfusion_tpu.ops import splat, fuse, clean, fill_in
from tests import synthetic as syn

INTR = syn.DEFAULT_INTR
H, W = syn.H, syn.W
CAP = 1 << 16


def _frame(pose=None, scene=None):
    if pose is None:
        pose = np.eye(4, dtype=np.float32)
    if scene is None:
        scene = syn.make_scene()
    pts, cols = scene
    rgb, depth = syn.render(pts, cols, pose, INTR)
    filt = pp.bilateral_filter_depth(jnp.asarray(depth))
    vmap_raw = pp.create_vmap(jnp.asarray(depth), INTR, 5.0)
    vmap_f = pp.create_vmap(filt, INTR, 5.0)
    nmap_f = pp.create_nmap(vmap_f)
    return dict(rgb=jnp.asarray(rgb), depth=jnp.asarray(depth), filt=filt,
                vmap_raw=vmap_raw, vmap_f=vmap_f, nmap_f=nmap_f, pose=jnp.asarray(pose))


def _init_map(f, mask=None):
    mask = jnp.zeros((H, W), jnp.uint8) if mask is None else mask
    return sm.init_from_frame(
        CAP, f["vmap_raw"], f["vmap_f"], f["nmap_f"], f["rgb"], mask,
        jnp.uint8(0), f["pose"], INTR, time=1.0,
    )


def test_init_from_frame_counts():
    f = _frame()
    m = _init_map(f)
    valid = np.isfinite(np.asarray(f["vmap_raw"])[..., 0]) & np.isfinite(
        np.asarray(f["nmap_f"])[..., 0])
    assert int(m.count) == int(valid.sum())
    n = int(m.count)
    assert np.isfinite(np.asarray(m.pos[:n])).all()
    assert np.all(np.asarray(m.radius[:n]) > 0)


def test_index_map_roundtrip_depth():
    f = _frame()
    m = _init_map(f)
    im = splat.render_index_map(
        m, jnp.eye(4), INTR, H, W, time=1.0, time_delta=200, max_depth=5.0
    )
    idx = np.asarray(im.index)
    depth = np.asarray(f["depth"])
    imd = np.asarray(im.depth)
    covered = idx >= 0
    # most valid pixels should be covered and agree in depth
    valid = depth > 0
    assert covered[valid].mean() > 0.9
    agree = np.abs(imd[covered & valid] - depth[covered & valid])
    assert np.median(agree) < 1e-3


def test_index_map_dedup():
    f = _frame()
    m = _init_map(f)
    im = splat.render_index_map(
        m, jnp.eye(4), INTR, H, W, time=1.0, time_delta=200, max_depth=5.0
    )
    idx = np.asarray(im.index).ravel()
    idx = idx[idx >= 0]
    assert len(np.unique(idx)) == len(idx)  # one pixel per surfel slot


def test_combined_predict_matches_frame():
    f = _frame()
    m = _init_map(f)
    im = splat.render_index_map(
        m, jnp.eye(4), INTR, H, W, time=1.0, time_delta=200, max_depth=5.0
    )
    pred = splat.combined_predict(im, INTR, max_depth=5.0)
    depth = np.asarray(f["depth"])
    pd = np.asarray(pred.depth)
    valid = depth > 0
    cov = (pd[valid] > 0).mean()
    assert cov > 0.95, f"prediction coverage {cov}"
    err = np.abs(pd - depth)[valid & (pd > 0)]
    assert np.median(err) < 5e-3
    # predicted colors close to frame colors where covered
    pc = np.asarray(pred.rgb)
    fc = np.asarray(f["rgb"]).astype(np.float32)
    cerr = np.abs(pc - fc)[valid & (pd > 0)]
    assert np.median(cerr) < 20


def test_fuse_merges_not_duplicates():
    f = _frame()
    m = _init_map(f)
    n0 = int(m.count)
    mask = jnp.zeros((H, W), jnp.uint8)
    im = splat.render_index_map(
        m, jnp.eye(4), INTR, H, W, time=2.0, time_delta=200, max_depth=5.0
    )
    res = fuse.fuse(
        m, im, f["vmap_raw"], f["vmap_f"], f["nmap_f"], f["rgb"], mask,
        jnp.uint8(0), f["pose"], INTR, time=2.0, weighting=1.0, max_depth=5.0,
    )
    n_matched = int(np.asarray(res.matched_pixels).sum())
    n_new = int(np.asarray(res.new_pixels).sum())
    assert n_matched > 5 * n_new, (n_matched, n_new)  # same view -> mostly merges
    assert int(res.map.count) == n0 + n_new
    # merged surfels got confidence boosts and last_seen update
    m2 = res.map
    boosted = np.asarray(m2.conf[:n0]) > np.asarray(m.conf[:n0])
    assert boosted.mean() > 0.2  # checkerboard: ~1/4 of pixels fuse per frame


def test_fuse_checkerboard_subsample():
    f = _frame()
    m = _init_map(f)
    mask = jnp.zeros((H, W), jnp.uint8)
    im = splat.render_index_map(
        m, jnp.eye(4), INTR, H, W, time=2.0, time_delta=200, max_depth=5.0
    )
    res_even = fuse.fuse(
        m, im, f["vmap_raw"], f["vmap_f"], f["nmap_f"], f["rgb"], mask,
        jnp.uint8(0), f["pose"], INTR, time=2.0, weighting=1.0, max_depth=5.0,
    )
    total = np.asarray(res_even.matched_pixels).sum() + np.asarray(res_even.new_pixels).sum()
    assert total <= (H * W) / 4 + 1


def test_clean_culls_unstable():
    f = _frame()
    m = _init_map(f)  # init_time = last_seen = 1, conf < 1 mostly
    im = splat.render_index_map(
        m, jnp.eye(4), INTR, H, W, time=30.0, time_delta=200, max_depth=5.0
    )
    res = clean.clean(
        m, im, f["filt"], jnp.zeros((H, W), jnp.uint8), jnp.uint8(0),
        jnp.eye(4), INTR, time=30.0, time_delta=200,
        conf_threshold=10.0, max_depth=5.0, outlier_coeff=3.0,
    )
    # all surfels are older than unstable_time_limit=20 with conf<10 -> culled
    assert int(res.map.count) == 0
    res2 = clean.clean(
        m, im, f["filt"], jnp.zeros((H, W), jnp.uint8), jnp.uint8(0),
        jnp.eye(4), INTR, time=5.0, time_delta=200,
        conf_threshold=10.0, max_depth=5.0, outlier_coeff=3.0,
    )
    assert int(res2.map.count) > 0.9 * int(m.count)


def test_clean_mask_penalty():
    f = _frame()
    m = _init_map(f)
    im = splat.render_index_map(
        m, jnp.eye(4), INTR, H, W, time=2.0, time_delta=200, max_depth=5.0
    )
    # frame mask says the left half belongs to object 1 -> bg surfels there
    # get penalised (they project onto disagreeing pixels at matching depth)
    mask = np.zeros((H, W), np.uint8)
    mask[:, : W // 2] = 1
    res = clean.clean(
        m, im, f["filt"], jnp.asarray(mask), jnp.uint8(0),
        jnp.eye(4), INTR, time=2.0, time_delta=200,
        conf_threshold=10.0, max_depth=5.0, outlier_coeff=3.0,
    )
    n = int(res.map.count)
    assert n == int(m.count)  # nothing culled yet (young surfels)
    conf_ratio = np.asarray(res.map.conf[:n]).sum() / np.asarray(m.conf[:n]).sum()
    assert conf_ratio < 0.95


def test_compaction_overflow():
    m = sm.empty(16)
    vals = jnp.arange(32, dtype=jnp.float32)
    keep = jnp.ones(32, bool)
    out = sm.compact_into(
        m, keep, jnp.stack([vals] * 3, -1), vals, jnp.stack([vals] * 3, -1),
        vals, vals, jnp.stack([vals] * 3, -1), vals,
    )
    assert int(out.count) == 16  # clamped, no wraparound
    np.testing.assert_allclose(np.asarray(out.conf), np.arange(16))


def test_fill_in():
    f = _frame()
    m = _init_map(f)
    im = splat.render_index_map(
        m, jnp.eye(4), INTR, H, W, time=1.0, time_delta=200, max_depth=5.0
    )
    pred = splat.combined_predict(im, INTR, max_depth=5.0)
    filled = fill_in.fill_in(pred, f["rgb"], f["vmap_f"], f["nmap_f"])
    # no NaN holes where the frame had data
    fv = np.asarray(filled.vmap)
    frame_ok = np.isfinite(np.asarray(f["vmap_f"])[..., 0])
    assert np.isfinite(fv[frame_ok]).all()
    assert 0.5 < float(fill_in.coverage(pred)) <= 1.0


def test_combined_predict_close_range_no_holes():
    """A surface mapped at 4 m and revisited at 0.5 m projects each surfel
    over ~8 px; the reference's radius-sized sprites (splat.vert:54-66)
    render it solid.  The multiscale candidate pyramid must keep the
    prediction hole rate < 1% there; the flat +-2 px window alone cannot."""
    far_z = 4.0
    # plane sampled at the pixel grid of a 4 m view (one surfel per pixel)
    us, vs = np.meshgrid(np.arange(W), np.arange(H))
    px = (us.ravel() - INTR.cx) / INTR.fx * far_z
    py = (vs.ravel() - INTR.cy) / INTR.fy * far_z
    n = px.size
    radius = np.full(n, 1.4142 * far_z / INTR.fx, np.float32)
    m = sm.SurfelMap(
        pos=jnp.asarray(np.stack([px, py, np.full(n, far_z)], -1),
                        jnp.float32),
        conf=jnp.full((n,), 10.0),
        color=jnp.zeros((n, 3)),
        init_time=jnp.ones((n,)),
        last_seen=jnp.ones((n,)),
        normal=jnp.asarray(np.tile([0.0, 0.0, -1.0], (n, 1)), jnp.float32),
        radius=jnp.asarray(radius),
        count=jnp.asarray(n, jnp.int32),
    )
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 3.5  # camera 0.5 m from the plane
    pose_inv = np.linalg.inv(pose).astype(np.float32)
    im = splat.render_index_map(m, jnp.asarray(pose_inv), INTR, H, W,
                                time=1.0, time_delta=1 << 30, max_depth=5.0)
    im_coarse = splat.render_index_map(
        m, jnp.asarray(pose_inv), INTR.level(2), H >> 2, W >> 2,
        time=1.0, time_delta=1 << 30, max_depth=5.0)
    interior = (slice(H // 4, 3 * H // 4), slice(W // 4, 3 * W // 4))

    pred = splat.combined_predict(im, INTR, 5.0, coarse=(im_coarse, 2))
    holes = np.asarray(pred.depth[interior] == 0)
    rate = holes.mean()
    assert rate < 0.01, f"close-range hole rate {rate:.1%}"

    # control: the flat window alone leaves most of the region empty,
    # proving the coarse level (not the window) provides the coverage
    pred_flat = splat.combined_predict(im, INTR, 5.0)
    flat_rate = np.asarray(pred_flat.depth[interior] == 0).mean()
    assert flat_rate > 0.3, f"expected large holes without coarse, got {flat_rate:.1%}"


def test_patch_index_map_matches_render():
    """The incremental post-fuse index map (splat.patch_index_map) must
    agree with a true second render (the reference's schedule,
    MaskFusion.cpp:541-561) on a no-motion fuse step: same winners where
    both are defined, refreshed last_seen/conf, and the appended unstables
    visible at their pixels."""
    import jax.numpy as jnp
    import numpy as np

    from maskfusion_tpu.camera import CameraIntrinsics
    from maskfusion_tpu.mapping import surfel_map as sm
    from maskfusion_tpu.ops import fuse as fuse_ops
    from maskfusion_tpu.ops import preprocess as pp
    from maskfusion_tpu.ops import splat as splat_ops
    from tests import synthetic as syn

    H, W = syn.H, syn.W
    intr = syn.DEFAULT_INTR
    pts, cols = syn.make_scene()
    rgb, depth = syn.render(pts, cols, np.eye(4), intr)
    dj = jnp.asarray(depth)
    vmap = pp.create_vmap(dj, intr, 5.0)
    nmap = pp.create_nmap(vmap)
    mask = jnp.zeros((H, W), jnp.uint8)
    pose = jnp.eye(4)
    m = sm.init_from_frame(1 << 16, vmap, vmap, nmap, jnp.asarray(rgb),
                           mask, jnp.uint8(0), pose, intr, time=1.0)
    im1 = splat_ops.render_index_map(m, pose, intr, H, W, 2.0, 1 << 30, 5.0)
    # second observation with a small depth perturbation so appends happen
    d2 = depth.copy()
    d2[10:14, 10:14] = 0.0
    vmap2 = pp.create_vmap(jnp.asarray(d2), intr, 5.0)
    nmap2 = pp.create_nmap(vmap2)
    fres = fuse_ops.fuse(m, im1, vmap2, vmap2, nmap2, jnp.asarray(rgb),
                         mask, jnp.uint8(0), pose, intr, 2.0, 1.0, 5.0,
                         checkerboard=False)
    conf_px = sm.pixel_confidence(H, W, intr, 1.0)
    rad_px = sm.radius_from_depth(vmap2[..., 2], nmap2[..., 2], intr)
    im2_patch = splat_ops.patch_index_map(
        im1, fres.map, fres.new_pixels, vmap2, nmap2, conf_px,
        jnp.asarray(rgb).astype(jnp.float32), rad_px, pose, 2.0, m.count)
    im2_true = splat_ops.render_index_map(fres.map, pose, intr, H, W, 2.0,
                                          1 << 30, 5.0)
    ip = np.asarray(im2_patch.index)
    it = np.asarray(im2_true.index)
    both = (ip >= 0) & (it >= 0)
    agree = (ip == it) | ~both
    assert agree.mean() > 0.95, f"winner agreement {agree.mean():.3f}"
    dp = np.asarray(im2_patch.depth)
    dt = np.asarray(im2_true.depth)
    sel = both & (ip == it) & np.isfinite(dp) & np.isfinite(dt)
    assert np.abs(dp[sel] - dt[sel]).max() < 1e-4
    # merged winners carry the refreshed last_seen
    ls = np.asarray(im2_patch.last_seen)
    matched = np.asarray(fres.matched_pixels)
    seen_now = ls[matched & (ip >= 0)]
    assert (seen_now == 2.0).mean() > 0.6
    # appended unstables visible at their own pixels with the -2 flag
    newp = np.asarray(fres.new_pixels)
    if newp.any():
        assert (ls[newp] == -2.0).mean() > 0.5
