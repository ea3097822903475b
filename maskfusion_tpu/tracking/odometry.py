"""Joint projective-ICP + photometric RGB-D odometry.

TPU-native re-design of the reference RGBDOdometry
(Core/Utils/RGBDOdometry.{h,cpp}): the whole coarse-to-fine Gauss-Newton
optimisation — SO(3) photometric pre-alignment, then {10,5,4} ICP+RGB
iterations over a 3-level pyramid with the 6x6 solve inlined — runs as ONE
jitted function with `lax.while_loop`/`lax.fori_loop`, so a frame costs a
single dispatch instead of the reference's ~19 device->host JtJ downloads
per model per frame (reduce.cu:505-523).

Pose convention: (R, t) is camera-to-world, exactly as the reference's
(rot, trans) in getIncrementalTransformation (RGBDOdometry.cpp:227-497).
The returned `delta` is the prev->curr increment in the previous camera
frame (the reference's `resultRt`).

Multi-model use: this function is pure, so the engine `jax.vmap`s it over
the model axis — all object models and the background track in one batched
dispatch (the reference loops models sequentially, MaskFusion.cpp:246-278).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from maskfusion_tpu import se3
from maskfusion_tpu.camera import CameraIntrinsics
from maskfusion_tpu.ops import preprocess as pp
from maskfusion_tpu.ops import reduce as red


class FramePyramids(NamedTuple):
    """The 'next' (current frame) side of tracking."""
    vmaps: Tuple[jnp.ndarray, ...]       # camera-frame vertex maps per level
    nmaps: Tuple[jnp.ndarray, ...]
    depths: Tuple[jnp.ndarray, ...]      # float32 depth, NaN invalid
    intensities: Tuple[jnp.ndarray, ...]  # uint8
    masks: Tuple[jnp.ndarray, ...]       # uint8 instance labels


class ModelPyramids(NamedTuple):
    """The 'last/prev' (model prediction) side of tracking."""
    vmaps_g: Tuple[jnp.ndarray, ...]     # world-frame predicted vertex maps
    nmaps_g: Tuple[jnp.ndarray, ...]
    depths: Tuple[jnp.ndarray, ...]      # NaN-invalid predicted depth
    intensities: Tuple[jnp.ndarray, ...]
    # optional precomputed photometric validity (reduce.rgb_last_valid);
    # the windowed object path supplies it from halo-padded images so
    # window-border erosion matches the full-frame pass
    last_valids: Optional[Tuple[jnp.ndarray, ...]] = None


class OdometryResult(NamedTuple):
    t: jnp.ndarray            # (3,) new camera translation (cam->world)
    R: jnp.ndarray            # (3,3) new camera rotation
    delta: jnp.ndarray        # (4,4) prev->curr increment (prev camera frame)
    A: jnp.ndarray            # (6,6) final blended GN system (for covariance)
    b: jnp.ndarray            # (6,)
    icp_error: jnp.ndarray    # sqrt(sum r^2)/count
    icp_count: jnp.ndarray
    rgb_error: jnp.ndarray
    rgb_count: jnp.ndarray
    so3_error: jnp.ndarray
    so3_count: jnp.ndarray


def build_frame_pyramids_for_odometry(
    levels,
    raw_rgb: jnp.ndarray,
    max_depth_rgb: float = 6.0,
) -> FramePyramids:
    """Assemble the 'next' side from preprocess.build_frame_pyramids output.

    Depth for the photometric term comes from the vertex maps' z plane with
    the 6 m RGB cutoff and NaN holes (ref verticesToDepth + pyrDownGaussF,
    RGBDOdometry.cpp:187-204); intensity is recomputed from the raw frame.
    """
    depths = []
    intens = []
    d0 = pp.vertices_to_depth(levels[0]["vmap"], max_depth_rgb)
    g0 = pp.rgb_to_intensity(raw_rgb)
    for i in range(len(levels)):
        if i > 0:
            d_prev = jnp.where(jnp.isfinite(depths[i - 1]), depths[i - 1], 0.0)
            d = pp.pyr_down_gauss_depth(d_prev)
            d = jnp.where(d > 0, d, jnp.nan)
            g = pp.pyr_down_uchar_gauss(intens[i - 1])
        else:
            d, g = d0, g0
        depths.append(d)
        intens.append(g)
    return FramePyramids(
        vmaps=tuple(l["vmap"] for l in levels),
        nmaps=tuple(l["nmap"] for l in levels),
        depths=tuple(depths),
        intensities=tuple(intens),
        masks=tuple(l["mask"] for l in levels),
    )


def build_model_pyramids(
    pred_vmap: jnp.ndarray,
    pred_nmap: jnp.ndarray,
    pred_rgb: jnp.ndarray,
    model_pose: jnp.ndarray,
    num_levels: int = 3,
    max_depth_rgb: float = 6.0,
) -> ModelPyramids:
    """Assemble the 'prev' side from a model's predicted view.

    Mirrors initICPModel (RGBDOdometry.cpp:153-185: build pyramid, then
    transform every level into the world frame with the model pose) and
    initRGBModel (:206-209)."""
    R = model_pose[:3, :3]
    t = model_pose[:3, 3]
    vmaps, nmaps, depths, intens = [], [], [], []
    v, n = pred_vmap, pred_nmap
    d = pp.vertices_to_depth(pred_vmap, max_depth_rgb)
    g = pp.rgb_to_intensity(pred_rgb)
    for i in range(num_levels):
        if i > 0:
            v = pp.resize_vmap(vmaps_cam[-1])
            n = pp.resize_nmap(nmaps_cam[-1])
            d_prev = jnp.where(jnp.isfinite(depths[i - 1]), depths[i - 1], 0.0)
            d = pp.pyr_down_gauss_depth(d_prev)
            d = jnp.where(d > 0, d, jnp.nan)
            g = pp.pyr_down_uchar_gauss(intens[i - 1])
        if i == 0:
            vmaps_cam, nmaps_cam = [v], [n]
        else:
            vmaps_cam.append(v)
            nmaps_cam.append(n)
        vg, ng = pp.transform_maps(v, n, R, t)
        vmaps.append(vg)
        nmaps.append(ng)
        depths.append(d)
        intens.append(g)
    return ModelPyramids(
        vmaps_g=tuple(vmaps), nmaps_g=tuple(nmaps),
        depths=tuple(depths), intensities=tuple(intens),
    )


def _k_matrices(intr: CameraIntrinsics, level: int):
    il = intr.level(level)
    if any(isinstance(v, jnp.ndarray) for v in (il.fx, il.fy, il.cx, il.cy)):
        # traced intrinsics (windowed object tracking shifts the principal
        # point by a dynamic crop offset, engine.track_objects_win) — build
        # K and its closed-form pinhole inverse inside the trace
        fx = jnp.float32(il.fx)
        fy = jnp.float32(il.fy)
        cx = jnp.float32(il.cx)
        cy = jnp.float32(il.cy)
        z = jnp.float32(0.0)
        o = jnp.float32(1.0)
        K = jnp.stack([
            jnp.stack([fx, z, cx]),
            jnp.stack([z, fy, cy]),
            jnp.stack([z, z, o]),
        ])
        K_inv = jnp.stack([
            jnp.stack([1.0 / fx, z, -cx / fx]),
            jnp.stack([z, 1.0 / fy, -cy / fy]),
            jnp.stack([z, z, o]),
        ])
        return K, K_inv
    K = np.array(
        [[il.fx, 0, il.cx], [0, il.fy, il.cy], [0, 0, 1]], dtype=np.float32
    )
    return K, np.linalg.inv(K).astype(np.float32)


def _rigid_inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = T[:3, :3]
    t = T[:3, 3]
    Ti = jnp.eye(4, dtype=T.dtype)
    Ti = Ti.at[:3, :3].set(R.T)
    Ti = Ti.at[:3, 3].set(-R.T @ t)
    return Ti


def get_incremental_transformation(
    t_prev: jnp.ndarray,
    R_prev: jnp.ndarray,
    frame: FramePyramids,
    model: ModelPyramids,
    so3_last_intensities: Optional[Tuple[jnp.ndarray, ...]],
    intr: CameraIntrinsics,
    *,
    rgb_only: bool = False,
    icp_weight: float = 10.0,
    pyramid: bool = True,
    fast_odom: bool = False,
    use_so3: bool = True,
    mask_id: Optional[jnp.ndarray] = None,
    use_mask_rgb: bool = True,
    use_mask_icp: bool = False,
    dist_thresh: float = 0.10,
    angle_thresh_sine: float = 0.34202,
    max_depth_delta_rgb: float = 0.07,
    # exact gsobel-kernel normalisation; see Config.sobel_scale for why this
    # differs from the reference's 1/8
    sobel_scale: float = 1.0 / (2.0 * (2.0 * 0.52201 + 0.79451)),
    min_grad_magnitudes: Tuple[float, ...] = (5.0, 3.0, 1.0),
    so3_iterations: int = 10,
    translation_jump_limit: float = 0.3,
    num_levels: int = 3,
    assoc_period: int = 1,
    gn_damping: float = 0.0,
    rgb_finest_only: bool = False,
    gn_step_eps: float = 0.0,
) -> OdometryResult:
    """One tracking solve. Structure mirrors RGBDOdometry.cpp:227-497.

    assoc_period > 1 enables frozen-association GN: per pyramid level the
    iterations are split into ceil(iters/period) chunks; only the first
    iteration of each chunk runs the projective correspondence search (the
    two random row-gathers that dominate TPU tracking cost — see
    CLAUDE.md's cost model), the rest re-linearise the point-to-plane term
    against the frozen matches and keep the photometric term's (A, b) from
    the association point.  The reference re-searches every iteration
    (reduce.cu:292-366 runs inside each GN call) because fragment-shader
    texture fetches are effectively free on its hardware; on TPU they are
    the bottleneck.  rgb_only tracking keeps period=1 (its divergence check
    needs a fresh residual every iteration)."""
    use_icp = (not rgb_only) and icp_weight > 0
    use_rgb = rgb_only or icp_weight < 100

    f32 = jnp.float32
    t_prev = t_prev.astype(f32)
    R_prev = R_prev.astype(f32)
    R_prev_inv = R_prev.T

    # --- derivative images (RGBDOdometry.cpp:245-250) ---
    didx, didy = [], []
    for i in range(num_levels):
        dx, dy = pp.compute_derivative_images(frame.intensities[i])
        didx.append(dx)
        didy.append(dy)

    so3_error = jnp.array(0.0, f32)
    so3_count = jnp.array(0.0, f32)
    result_R = jnp.eye(3, dtype=f32)

    # --- SO(3) pre-alignment on the coarsest level (.cpp:254-325) ---
    if use_so3 and so3_last_intensities is not None:
        lvl = num_levels - 1
        K, K_inv = _k_matrices(intr, lvl)
        K = jnp.asarray(K)
        K_inv = jnp.asarray(K_inv)
        last_img = so3_last_intensities[lvl]
        next_img = frame.intensities[lvl]

        big = jnp.array(np.finfo(np.float32).max / 2, f32)

        def so3_cond(state):
            i, _, _, _, _, _, _, done = state
            return (i < so3_iterations) & jnp.logical_not(done)

        def so3_body(state):
            i, resultR, lastErr, lastCnt, lastResultR, err, cnt, done = state
            homography = K @ resultR @ K_inv
            krlr = K @ resultR
            term = red.so3_step(last_img, next_img, homography, K_inv, krlr)
            cur_err = jnp.sqrt(term.residual_sq) / jnp.maximum(term.count, 1.0)
            cur_cnt = term.count
            # divergence check (.cpp:300-307): error grew -> revert + stop
            diverged = cur_err > lastErr + 0.001
            converged = (cur_err < lastErr) & (jnp.abs(lastErr - cur_cnt) < 0.001)
            delta = se3.solve_6x6_ldlt(term.A, term.b)  # 3x3 path: pad below
            rot_update = se3.rodrigues(delta)
            new_resultR = rot_update @ resultR
            keep = diverged | converged
            return (
                i + 1,
                jnp.where(diverged, lastResultR, jnp.where(converged, resultR, new_resultR)),
                jnp.where(keep, lastErr, cur_err),
                jnp.where(keep, lastCnt, cur_cnt),
                jnp.where(keep, lastResultR, resultR),
                jnp.where(diverged, lastErr, cur_err),
                jnp.where(diverged, lastCnt, cur_cnt),
                keep,
            )

        init = (
            jnp.array(0, jnp.int32), result_R, big, big, jnp.eye(3, dtype=f32),
            so3_error, so3_count, jnp.array(False),
        )
        (_, result_R, _, _, _, so3_error, so3_count, _) = jax.lax.while_loop(
            so3_cond, so3_body, init
        )

    # --- iteration schedule (.cpp:327-329) ---
    if fast_odom:
        iters = [3] + [0] * (num_levels - 1)
    elif pyramid:
        iters = [10, 5, 4][:num_levels]
    else:
        iters = [10] + [0] * (num_levels - 1)

    result_rt = jnp.eye(4, dtype=f32)
    result_rt = result_rt.at[:3, :3].set(result_R)

    t_curr = t_prev
    R_curr = R_prev
    lastA = jnp.zeros((6, 6), f32)
    lastb = jnp.zeros((6,), f32)
    icp_error = jnp.array(0.0, f32)
    icp_count = jnp.array(0.0, f32)
    rgb_error = jnp.array(0.0, f32)
    rgb_count = jnp.array(0.0, f32)

    for lvl in range(num_levels - 1, -1, -1):
        if iters[lvl] == 0:
            continue
        K, K_inv = _k_matrices(intr, lvl)
        Kj = jnp.asarray(K)
        K_invj = jnp.asarray(K_inv)
        il = intr.level(lvl)
        min_scale = (min_grad_magnitudes[lvl] ** 2) / (sobel_scale ** 2)
        # rgb_finest_only: small-object photometrics are boundary-dominated
        # at coarse levels (a 40x45 px patch is ~10x11 at level 2, nearly
        # all within the erosion band) — measured 1.7-2.4 cm of spurious
        # motion injected in ONE frame by the coarse levels on a STATIC
        # object.  Keep the photometric term at the finest level only;
        # coarse levels stay point-to-plane ICP.
        use_rgb = (rgb_only or icp_weight < 100) and (
            lvl == 0 or not rgb_finest_only)

        # iteration-invariant precomputes (the reference redoes these every
        # GN iteration): packed model maps + the static RGB validity gates
        vn_packed = red.pack_model_maps(
            model.vmaps_g[lvl], model.nmaps_g[lvl]) if use_icp else None
        static_valid = red.rgb_static_valid(
            frame.intensities[lvl], frame.depths[lvl],
            didx[lvl], didy[lvl], min_scale,
            next_mask=frame.masks[lvl] if use_mask_rgb else None,
            mask_id=mask_id if use_mask_rgb else None,
        ) if use_rgb else None
        last_valid = (model.last_valids[lvl]
                      if model.last_valids is not None
                      else red.rgb_last_valid(
                          model.intensities[lvl])) if use_rgb else None

        def body(j, carry, lvl=lvl, Kj=Kj, K_invj=K_invj, il=il,
                 min_scale=min_scale, vn_packed=vn_packed,
                 static_valid=static_valid, last_valid=last_valid,
                 frozen=None):
            (result_rt, t_curr, R_curr, last_rgb_error, lastA, lastb,
             icp_error, icp_count, rgb_error, rgb_count, done) = carry

            if use_rgb and frozen is None:
                Rt = _rigid_inverse(result_rt)
                Rwarp = Rt[:3, :3]
                krk_inv = Kj @ Rwarp @ K_invj
                kt = Kj @ Rt[:3, 3]
                corres = red.compute_rgb_residual(
                    didx[lvl], didy[lvl],
                    model.depths[lvl], frame.depths[lvl],
                    model.intensities[lvl], frame.intensities[lvl],
                    krk_inv, kt, min_scale, max_depth_delta_rgb,
                    static_valid=static_valid, last_valid=last_valid,
                )
                tmp_error = jnp.sqrt(corres.sigma_sum) / jnp.maximum(corres.count, 1.0)
                sigma_val = jnp.where(tmp_error == 0, 1.0, corres.count)
                if rgb_only:
                    sigma_val = jnp.array(-1.0, f32)
                    done = done | (tmp_error > last_rgb_error)
                new_rgb_error = tmp_error
                new_rgb_count = corres.count
            elif use_rgb:
                # frozen photometric term: (A, b) linearised at the last
                # association; matches/rows have no other pose dependence
                corres = None
                new_rgb_error, new_rgb_count = rgb_error, rgb_count
            else:
                corres = None
                new_rgb_error, new_rgb_count = rgb_error, rgb_count

            if use_icp:
                if frozen is None:
                    icp_term = red.icp_step(
                        R_curr, t_curr,
                        frame.vmaps[lvl], frame.nmaps[lvl],
                        R_prev_inv, t_prev, il,
                        model.vmaps_g[lvl], model.nmaps_g[lvl],
                        dist_thresh, angle_thresh_sine,
                        mask=frame.masks[lvl] if use_mask_icp else None,
                        mask_id=mask_id if use_mask_icp else None,
                        vn_packed=vn_packed,
                    )
                else:
                    icp_term = red.icp_term_from_assoc(
                        R_curr, t_curr,
                        frame.vmaps[lvl], frame.nmaps[lvl],
                        R_prev_inv, t_prev, frozen[0],
                    )
                new_icp_error = jnp.sqrt(icp_term.residual_sq) / jnp.maximum(
                    icp_term.count, 1.0
                )
                new_icp_count = icp_term.count
            else:
                new_icp_error, new_icp_count = icp_error, icp_count

            if use_rgb:
                if frozen is None:
                    rgb_term = red.rgb_step(
                        corres, sigma_val, il,
                        didx[lvl], didy[lvl], sobel_scale,
                    )
                else:
                    rgb_term = frozen[1]

            if use_icp and use_rgb:
                w = icp_weight
                A = rgb_term.A + w * w * icp_term.A
                b = rgb_term.b + w * icp_term.b
            elif use_icp:
                A, b = icp_term.A, icp_term.b
            else:
                A, b = rgb_term.A, rgb_term.b

            if gn_damping > 0:
                # Levenberg-style zero-step prior: a small object's GN
                # systems are few-pixel and ill-conditioned (measured: a
                # 47-pixel level-2 photometric term proposed 0.11 m from
                # 4 mm of true motion), so noise explodes along their weak
                # directions.  Damping suppresses noise steps while strong
                # (true-motion) signal passes.  Used by the static-scene
                # object configuration (Config.object_gn_damping); the
                # default is 0 = the reference's plain GN
                # (RGBDOdometry.cpp:227-497).
                lam = gn_damping * (jnp.trace(A) / 6.0)
                A = A + lam * jnp.eye(6, dtype=A.dtype)
            x = se3.solve_6x6_ldlt(A, b)
            new_result_rt = se3.se3_exp_update(result_rt, x)

            prevT = se3.make_pose(R_prev, t_prev)
            currentT = prevT @ _rigid_inverse(new_result_rt)

            def keep(old, new):
                return jnp.where(done, old, new)

            out_done = done
            if gn_step_eps > 0:
                # convergence cutoff: once the solved increment falls below
                # eps (metres / radians — orders below sensor noise), the
                # remaining fixed-schedule iterations are numerically inert;
                # under the while_loop schedule below they are SKIPPED
                # outright.  The reference runs the full (10,5,4) schedule
                # unconditionally (RGBDOdometry.cpp:327-497) because a GPU
                # warp gains nothing from early exit — a TPU while_loop
                # does.  This iteration's update still applies (keep() uses
                # the incoming done); only subsequent ones are elided.
                out_done = done | (jnp.max(jnp.abs(x)) < gn_step_eps)

            return (
                keep(result_rt, new_result_rt),
                keep(t_curr, currentT[:3, 3]),
                keep(R_curr, currentT[:3, :3]),
                keep(last_rgb_error, new_rgb_error),
                keep(lastA, A),
                keep(lastb, b),
                keep(icp_error, new_icp_error),
                keep(icp_count, new_icp_count),
                keep(rgb_error, new_rgb_error),
                keep(rgb_count, new_rgb_count),
                out_done,
            )

        carry = (
            result_rt, t_curr, R_curr,
            jnp.array(np.finfo(np.float32).max, f32),
            lastA, lastb, icp_error, icp_count, rgb_error, rgb_count,
            jnp.array(False),
        )
        # Frozen association only pays on level 0 (the full-res gathers are
        # the cost; coarser levels are 4x/16x smaller) — and only level 0
        # has enough inliers for the frozen re-linearisations to be stable
        # (a 76-pixel object's coarse level diverged under a 5-iteration
        # frozen chunk; fresh searches keep it bounded).
        period = (1 if (rgb_only or not use_icp or lvl > 0)
                  else max(1, assoc_period))
        if period == 1:
            if gn_step_eps > 0:
                # while_loop so converged solves SKIP their remaining
                # iterations (fori + done-select still executes the body)
                n_it = iters[lvl]

                def w_cond(s, n_it=n_it):
                    return (s[0] < n_it) & jnp.logical_not(s[1][10])

                def w_body(s):
                    j, c = s
                    return (j + 1, body(j, c))

                _, carry = jax.lax.while_loop(
                    w_cond, w_body, (jnp.int32(0), carry))
            else:
                carry = jax.lax.fori_loop(0, iters[lvl], body, carry)
        else:
            # chunked frozen-association schedule: one searching iteration,
            # then (chunk - 1) gather-free re-linearisations
            def fresh_assoc(c):
                (result_rt_c, t_c, R_c) = c[0], c[1], c[2]
                assoc = red.icp_associate(
                    R_c, t_c, frame.vmaps[lvl], frame.nmaps[lvl],
                    R_prev_inv, t_prev, il, vn_packed,
                    dist_thresh, angle_thresh_sine,
                    mask=frame.masks[lvl] if use_mask_icp else None,
                    mask_id=mask_id if use_mask_icp else None,
                )
                if use_rgb:
                    Rt = _rigid_inverse(result_rt_c)
                    krk_inv = Kj @ Rt[:3, :3] @ K_invj
                    kt = Kj @ Rt[:3, 3]
                    corres = red.compute_rgb_residual(
                        didx[lvl], didy[lvl],
                        model.depths[lvl], frame.depths[lvl],
                        model.intensities[lvl], frame.intensities[lvl],
                        krk_inv, kt, min_scale, max_depth_delta_rgb,
                        static_valid=static_valid, last_valid=last_valid,
                    )
                    tmp_error = jnp.sqrt(corres.sigma_sum) / jnp.maximum(
                        corres.count, 1.0)
                    sigma_val = jnp.where(tmp_error == 0, 1.0, corres.count)
                    rgb_term = red.rgb_step(
                        corres, sigma_val, il, didx[lvl], didy[lvl],
                        sobel_scale,
                    )
                    c = c[:3] + (tmp_error,) + c[4:8] + (
                        tmp_error, corres.count, c[10])
                else:
                    rgb_term = None
                return (assoc, rgb_term), c

            left = iters[lvl]
            frozen = None
            while left > 0:
                chunk = min(period, left)
                left -= chunk
                if frozen is None or gn_step_eps <= 0:
                    frozen, carry = fresh_assoc(carry)
                else:
                    # converged chunks skip the association search (the
                    # expensive full-res gathers) entirely
                    frozen, carry = jax.lax.cond(
                        jnp.logical_not(carry[10]),
                        lambda args: fresh_assoc(args[0]),
                        lambda args: (args[1], args[0]),
                        (carry, frozen))
                fbody = functools.partial(body, frozen=frozen)
                if gn_step_eps > 0:
                    def wc_cond(s, n_it=chunk):
                        return (s[0] < n_it) & jnp.logical_not(s[1][10])

                    def wc_body(s, fb=fbody):
                        j, c = s
                        return (j + 1, fb(j, c))

                    _, carry = jax.lax.while_loop(
                        wc_cond, wc_body, (jnp.int32(0), carry))
                else:
                    carry = jax.lax.fori_loop(0, chunk, fbody, carry)
        (result_rt, t_curr, R_curr, _, lastA, lastb,
         icp_error, icp_count, rgb_error, rgb_count, _) = carry

    # translation jump rejection (.cpp:478-482)
    if use_rgb:
        jumped = jnp.linalg.norm(t_curr - t_prev) > translation_jump_limit
        t_curr = jnp.where(jumped, t_prev, t_curr)
        R_curr = jnp.where(jumped, R_prev, R_curr)
        result_rt = jnp.where(jumped, jnp.eye(4, dtype=f32), result_rt)

    return OdometryResult(
        t=t_curr, R=R_curr, delta=result_rt, A=lastA, b=lastb,
        icp_error=icp_error, icp_count=icp_count,
        rgb_error=rgb_error, rgb_count=rgb_count,
        so3_error=so3_error, so3_count=so3_count,
    )


def covariance(A: jnp.ndarray) -> jnp.ndarray:
    """inv(lastA) — used by the tracking-failure detector
    (RGBDOdometry.cpp:499, MaskFusion.cpp:377-414).  Unrolled SPD inverse:
    jnp.linalg.inv's LU lowering measured ~25 ms for this 6x6 on TPU."""
    return se3.spd_inverse_small(A + 1e-12 * jnp.eye(6, dtype=A.dtype))
