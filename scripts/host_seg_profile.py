"""Profile the HOST-side segmentation stage (engine._finish_one's
`segmentation` scope) on CPU: segmenter.perform + lifecycle, using the
two-object bench scene.  This runs entirely host-side, so it can be
measured without the TPU."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import bench
from maskfusion_tpu.camera import CameraIntrinsics, Resolution
from maskfusion_tpu.config import Config
from maskfusion_tpu.segmentation import create_segmenter
from maskfusion_tpu.segmentation.mf_segmentation import ModelInfo

W, H = 640, 480
frames, (fx, fy, cx, cy) = bench.make_two_object_frames(W, H, 8)
cfg = Config(seg_method="maskfusion")
seg = create_segmenter("maskfusion", cfg, Resolution(W, H),
                       CameraIntrinsics(fx, fy, cx, cy))

# fake inputs: vmap/nmap from depth, projected ids with 3 models
f = frames[4]
fd = f.host_depth()
import jax.numpy as jnp
d = jnp.asarray(f.depth)
u, v = np.meshgrid(np.arange(W), np.arange(H))
X = (u - cx) / fx * fd
Y = (v - cy) / fy * fd
vmap = jnp.asarray(np.stack([X, Y, fd], -1).astype(np.float32))
# crude normals
nm = np.zeros((H, W, 3), np.float32); nm[..., 2] = -1.0
nmap = jnp.asarray(nm)
ids = f.mask.astype(np.uint8)  # pretend projection matches gt masks
infos = [ModelInfo(0, 0), ModelInfo(1, 7), ModelInfo(2, 8)]

edge, nonedge = seg._edge_binary(vmap, nmap)
edge, nonedge = np.asarray(edge), np.asarray(nonedge)
jax.block_until_ready(edge)

import cProfile, pstats
res = seg.perform(f, vmap, nmap, ids, infos, 3, True,
                  nonedge=nonedge)
N = 20
t0 = time.perf_counter()
for _ in range(N):
    res = seg.perform(f, vmap, nmap, ids, infos, 3, True,
                      nonedge=nonedge)
dt = (time.perf_counter() - t0) / N * 1000
print(f"segmenter.perform: {dt:.2f} ms")

pr = cProfile.Profile()
pr.enable()
for _ in range(10):
    seg.perform(f, vmap, nmap, ids, infos, 3, True,
                nonedge=nonedge)
pr.disable()
pstats.Stats(pr).sort_stats("cumulative").print_stats(18)
