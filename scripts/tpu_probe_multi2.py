"""Split two-object DEVICE time: pipelined device stage vs fuse stage.

Times each jitted stage in isolation (N pipelined dispatches + one final
block on a scalar leaf, CLAUDE.md methodology) using realistic states from
a warmed engine.  The fuse stage is re-jitted WITHOUT donation so it can be
called repeatedly on the same buffers.
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

import bench


def main():
    from maskfusion_tpu.camera import CameraIntrinsics, Resolution
    from maskfusion_tpu.config import Config
    from maskfusion_tpu.engine import MaskFusion

    W, H = 640, 480
    n_warm = 14
    frames, (fx, fy, cx, cy) = bench.make_two_object_frames(W, H, n_warm + 2)
    cfg = Config(global_surfel_capacity=1 << 22,
                 object_surfel_capacity=1 << 19,
                 seg_method="maskfusion",
                 model_spawn_offset=2,
                 pipelined_multiobject=True)
    eng = MaskFusion(Resolution(W, H), CameraIntrinsics(fx, fy, cx, cy), cfg)
    for f in frames[:n_warm]:
        eng.process_frame(f)
    eng.drain_pipeline()
    glob = eng.models[0]
    objs = eng.models[1:]
    print("n_models:", len(eng.models), "windows:",
          [m.window for m in objs],
          "buckets:", [eng._bucket_for(m) for m in eng.models], flush=True)

    rgb = jnp.asarray(frames[n_warm].rgb)
    depth = jnp.asarray(frames[n_warm].depth.astype(np.float32))
    prev_seg = jnp.asarray(eng.last_segmentation)
    obj_aux = jnp.asarray(np.asarray(
        [[m.model_id, (m.window or (0, 0))[0], (m.window or (0, 0))[1]]
         for m in objs], np.float32).reshape(len(objs), 3))
    ids_vec = jnp.asarray([m.model_id for m in eng.models], jnp.float32)
    gb = eng._bucket_for(glob)
    ob = max(eng._bucket_for(m) for m in objs)
    windowed = all(m.window is not None for m in objs)

    def dev_stage():
        out = eng._pipelined_device_stage(
            glob.state, tuple(m.state for m in objs), obj_aux, ids_vec,
            rgb, depth, prev_seg, 100.0,
            glob_bucket=gb, obj_bucket=ob, windowed=windowed)
        return out[3]   # hostvec

    def timeit(name, fn, N=16):
        o = fn()
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(N):
            o = fn()
        np.asarray(o)
        dt = (time.perf_counter() - t0) / N * 1000
        print(f"{name:24s} {dt:7.2f} ms", flush=True)

    timeit("device_stage(3 models)", dev_stage)

    # glob-only variant for comparison
    def dev_stage_glob():
        out = eng._pipelined_device_stage(
            glob.state, (), jnp.zeros((0, 3), jnp.float32),
            ids_vec[:1], rgb, depth, prev_seg, 100.0,
            glob_bucket=gb, obj_bucket=ob, windowed=False)
        return out[3]

    timeit("device_stage(glob only)", dev_stage_glob)

    # fuse stage without donation (re-jit the underlying function)
    prep = eng._preprocess(rgb, depth, prev_seg)
    prevs = jnp.asarray(np.stack([np.asarray(m.prev_pose)
                                  for m in eng.models]))
    obj_params = jnp.asarray(np.asarray(
        [[m.model_id, m.conf_threshold, min(cfg.depth_cutoff, m.max_depth),
          cfg.weight_multiplier, (m.window or (0, 0))[0],
          (m.window or (0, 0))[1]] for m in objs],
        np.float32).reshape(len(objs), 6))
    seg_mask = prev_seg
    fuse_nodon = jax.jit(
        eng._pipelined_fuse_stage.__wrapped__,
        static_argnames=("glob_bucket", "obj_bucket", "parity", "windowed"))

    def fuse_stage():
        ng, nos = fuse_nodon(
            glob.state, tuple(m.state for m in objs), prep, rgb, seg_mask,
            prevs, 100.0, obj_params,
            glob_bucket=gb, obj_bucket=ob, parity=0, windowed=windowed)
        return ng.pose

    timeit("fuse_stage(3 models)", fuse_stage)

    def fuse_stage_glob():
        ng, nos = fuse_nodon(
            glob.state, (), prep, rgb, seg_mask, prevs[:1], 100.0,
            jnp.zeros((0, 6), jnp.float32),
            glob_bucket=gb, obj_bucket=ob, parity=0, windowed=False)
        return ng.pose

    timeit("fuse_stage(glob only)", fuse_stage_glob)


if __name__ == "__main__":
    main()
