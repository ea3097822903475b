"""Mask R-CNN inference latency at the reference operating point.

Times the jitted forward of the DEFAULT config (ResNet50-FPN, 512 px,
81 COCO classes — MaskRCNN.py.in:40-68 / config.toml.in) on the TPU chip
and reports milliseconds/frame plus the induced frame lag at the dataset's
24 Hz against the 30-frame queue budget (MainController.cpp:223).
Latency does not depend on the weights, so random-init params are fine."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
# env-var route is silently ignored (sitecustomize imports jax first)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
from maskfusion_tpu.maskrcnn.model import MaskRCNN, MaskRCNNConfig

cfg = MaskRCNNConfig()
model = MaskRCNN(cfg)
print("config: 512px / 81 classes / resnet50-FPN", flush=True)
params = model.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))
n_params = sum(x.size for x in jax.tree.leaves(params))
print(f"params: {n_params/1e6:.1f} M", flush=True)
fwd = jax.jit(lambda p, im: model.apply(p, im))
img = jnp.asarray(np.random.default_rng(0).uniform(
    0, 255, (1, cfg.image_size, cfg.image_size, 3)).astype(np.float32))

out = fwd(params, img)
jax.block_until_ready(out)
print("compiled", flush=True)

N = 24
t0 = time.perf_counter()
o = None
for _ in range(N):
    o = fwd(params, img)
jax.device_get(o["detection_scores"])
dt = (time.perf_counter() - t0) / N * 1000
frames_24hz = dt / (1000.0 / 24.0)
print(f"latency: {dt:.1f} ms/frame = {frames_24hz:.1f} frames at 24 Hz "
      f"(budget: 30 frames, MainController.cpp:223)", flush=True)

# bf16 variant: inference-quality cast, usually ~2x on MXU
params16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
fwd16 = jax.jit(lambda p, im: model.apply(p, im.astype(jnp.bfloat16)))
o = fwd16(params16, img)
jax.block_until_ready(o)
t0 = time.perf_counter()
for _ in range(N):
    o = fwd16(params16, img)
jax.device_get(o["detection_scores"])
dt16 = (time.perf_counter() - t0) / N * 1000
print(f"latency bf16: {dt16:.1f} ms/frame = "
      f"{dt16/(1000.0/24.0):.1f} frames at 24 Hz", flush=True)
