"""Finer honest bisect of track + preprocess internals."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from maskfusion_tpu.camera import CameraIntrinsics
from maskfusion_tpu.ops import preprocess as pp, reduce as red, sort_utils
from maskfusion_tpu.mapping import surfel_map as sm

W,H=640,480
intr = CameraIntrinsics(528.,528.,320.,240.)
u,v = np.meshgrid(np.arange(W), np.arange(H))
d0 = (1.5+0.0004*u+0.0003*v).astype(np.float32)
r0 = np.stack([(u*3)%256, v%256, (u+v)%256],-1).astype(np.uint8)
dj, rj = jnp.asarray(d0), jnp.asarray(r0)

def timeit(name, jfn, N=10):
    o = jfn(0); jax.device_get(jax.tree.leaves(o)[0].ravel()[0])
    t0=time.perf_counter()
    for i in range(N): o = jfn(i)
    jax.device_get(jax.tree.leaves(o)[0].ravel()[0])
    print(f"{name:32s} {(time.perf_counter()-t0)/N*1000:8.2f} ms", flush=True)

bil = jax.jit(lambda d: pp.bilateral_filter_depth(d, radius=6))
timeit("bilateral 640x480", lambda i: bil(dj + i*0.0))
filt = bil(dj)
gray = pp.rgb_to_intensity(rj)
pyr = jax.jit(lambda d,g: pp.build_frame_pyramids(d, g, jnp.zeros((H,W),jnp.uint8), intr, 5.0, 3))
timeit("build_frame_pyramids", lambda i: pyr(filt, gray))
levels = pyr(filt, gray)
vmap0, nmap0 = levels[0]["vmap"], levels[0]["nmap"]

icp = jax.jit(lambda R, t: red.icp_step(R, t, vmap0, nmap0, jnp.eye(3), jnp.zeros(3), intr, vmap0, nmap0, 0.10, 0.34202))
timeit("icp_step L0", lambda i: icp(jnp.eye(3), jnp.zeros(3)))

dx, dy = pp.compute_derivative_images(gray)
corres_f = jax.jit(lambda: red.compute_rgb_residual(dx, dy, dj, dj, gray, gray, jnp.eye(3), jnp.zeros(3), 1600.0, 0.07, next_mask=jnp.zeros((H,W),jnp.uint8), mask_id=jnp.uint8(0)))
timeit("compute_rgb_residual L0", lambda i: corres_f())
corres = corres_f()
cloud = pp.project_to_pointcloud(dj, intr)
rgbs = jax.jit(lambda: red.rgb_step(corres, jnp.array(-1.0), cloud, intr.fx, intr.fy, dx, dy, 0.272))
timeit("rgb_step L0", lambda i: rgbs())
deriv = jax.jit(lambda g: pp.compute_derivative_images(g))
timeit("derivatives L0", lambda i: deriv(gray))

# sort components at 512k
k = jnp.asarray(np.random.default_rng(0).integers(0, 307200, 1<<19).astype(np.int32))
x = jnp.asarray(np.random.default_rng(1).random(1<<19, dtype=np.float32))
srt = jax.jit(lambda a,b: jax.lax.sort((a, b, jnp.arange(1<<19, dtype=jnp.int32)), num_keys=2))
timeit("sort 512k (2key+idx)", lambda i: srt(k, x))
zb = jax.jit(lambda a, b: sort_utils.zbuffer_render(a, b, b>0, 307200))
timeit("zbuffer_render 512k", lambda i: zb(k, x))
