"""Verify optimizations + dig into icp_step."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from maskfusion_tpu.camera import CameraIntrinsics
from maskfusion_tpu.ops import preprocess as pp, reduce as red, sort_utils

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

gray = pp.rgb_to_intensity(rj)
pyr = jax.jit(lambda d,g: pp.build_frame_pyramids(d, g, jnp.zeros((H,W),jnp.uint8), intr, 5.0, 3))
timeit("build_frame_pyramids(sep)", lambda i: pyr(dj, gray))
levels = pyr(dj, gray)
vmap0, nmap0 = levels[0]["vmap"], levels[0]["nmap"]

k = jnp.asarray(np.random.default_rng(0).integers(0, 307200, 1<<19).astype(np.int32))
x = jnp.asarray(np.random.default_rng(1).random(1<<19, dtype=np.float32))
zb = jax.jit(lambda a, b: sort_utils.zbuffer_render(a, b, b>0, 307200))
timeit("zbuffer_render(binsearch)", lambda i: zb(k, x))

# icp_step pieces
flat_v = vmap0.reshape(-1,3)
icp = jax.jit(lambda R, t: red.icp_step(R, t, vmap0, nmap0, jnp.eye(3), jnp.zeros(3), intr, vmap0, nmap0, 0.10, 0.34202))
timeit("icp_step", lambda i: icp(jnp.eye(3), jnp.zeros(3)))

mm = jax.jit(lambda a, R: a @ R.T)
timeit("  (307k,3)@(3,3) default", lambda i: mm(flat_v, jnp.eye(3)))
ee = jax.jit(lambda a: jnp.einsum("pi,pj->ij", a, a, precision="highest"))
timeit("  einsum 7-gram highest", lambda i: ee(jnp.concatenate([flat_v, flat_v, flat_v[:, :1]], 1)))
ed = jax.jit(lambda a: jnp.einsum("pi,pj->ij", a, a))
timeit("  einsum 7-gram default", lambda i: ed(jnp.concatenate([flat_v, flat_v, flat_v[:, :1]], 1)))
g2 = jax.jit(lambda idx: flat_v[idx])
ii = jnp.asarray(np.random.default_rng(2).integers(0, 307200, 307200).astype(np.int32))
timeit("  row-gather 307k", lambda i: g2(ii))
cr = jax.jit(lambda a, b: jnp.cross(a, b))
timeit("  cross 307k", lambda i: cr(flat_v, flat_v))
