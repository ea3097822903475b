"""Quick TPU timing probe for the static SLAM step at 640x480."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
print("devices:", jax.devices())
from maskfusion_tpu.camera import Resolution, CameraIntrinsics
from maskfusion_tpu.config import Config
from maskfusion_tpu.engine import MaskFusion
from maskfusion_tpu.frame import FrameData

W, H = 640, 480
intr = CameraIntrinsics(528., 528., 320., 240.)
cfg = Config(static_mode=True, global_surfel_capacity=1 << 22)
eng = MaskFusion(Resolution(W, H), intr, cfg)

rng = np.random.default_rng(0)
u, v = np.meshgrid(np.arange(W), np.arange(H))
def frame(i):
    depth = (1.5 + 0.0004*u + 0.0003*v + 0.05*np.sin(u*0.05+i*0.1)).astype(np.float32)
    rgb = np.stack([(u*3+i)%256, v%256, (u+v)%256], -1).astype(np.uint8)
    return FrameData(rgb=rgb, depth=depth, timestamp=float(i))

t0 = time.perf_counter()
eng.process_frame(frame(0))
print(f"init frame: {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
eng.process_frame(frame(1))
print(f"first step (compile): {time.perf_counter()-t0:.1f}s")
times = []
for i in range(2, 12):
    t0 = time.perf_counter()
    eng.process_frame(frame(i))
    times.append(time.perf_counter()-t0)
print("steady-state ms/frame:", [round(t*1000,1) for t in times])
print(f"median: {np.median(times)*1000:.1f} ms -> {1/np.median(times):.1f} FPS")
print("sections:", {k: round(v,1) for k,v in eng.stopwatch.summary().items()})
