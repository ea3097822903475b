"""Which 2x decimation lowering is fast on this TPU?

Strided slicing [::2, ::2] showed up as the silent cost in the pooled
prediction pyramid; every pyr_down and the fuse parity subgrid use the
same pattern.  Compare lowerings on (480, 640) f32.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

H, W = 480, 640
a = jnp.asarray(np.random.rand(H, W).astype(np.float32))
a3 = jnp.asarray(np.random.rand(H, W, 3).astype(np.float32))


def timeit(name, jfn, N=96):
    o = jfn()
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for i in range(N):
        o = jfn()
    jax.device_get(o)
    dt = (time.perf_counter() - t0) / N * 1000
    print(f"{name:40s} {dt:8.3f} ms", flush=True)


timeit("nothing", lambda f=jax.jit(lambda x: x + 1.0): f(jnp.float32(1)))

timeit("strided slice [::2,::2]",
       lambda f=jax.jit(lambda x: jnp.sum(x[::2, ::2])): f(a))
timeit("strided slice x8 fields",
       lambda f=jax.jit(lambda x: sum(jnp.sum((x + i)[::2, ::2])
                                      for i in range(8))): f(a))
timeit("reshape pick [:,0,:,0]",
       lambda f=jax.jit(lambda x: jnp.sum(
           x.reshape(H // 2, 2, W // 2, 2)[:, 0, :, 0])): f(a))


def conv_dec(x):
    k = jnp.zeros((1, 1, 2, 2), jnp.float32).at[0, 0, 0, 0].set(1.0)
    y = jax.lax.conv_general_dilated(
        x[None, None], k, window_strides=(2, 2), padding="VALID")
    return y[0, 0]


timeit("conv identity stride2",
       lambda f=jax.jit(lambda x: jnp.sum(conv_dec(x))): f(a))
timeit("conv identity stride2 x8",
       lambda f=jax.jit(lambda x: sum(jnp.sum(conv_dec(x + i))
                                      for i in range(8))): f(a))


def rw_min(x):
    return jax.lax.reduce_window(x, jnp.inf, jax.lax.min,
                                 (2, 2), (2, 2), "VALID")


timeit("reduce_window min 2x2",
       lambda f=jax.jit(lambda x: jnp.sum(rw_min(x))): f(a))
timeit("reduce_window min 2x2 x8",
       lambda f=jax.jit(lambda x: sum(jnp.sum(rw_min(x + i))
                                      for i in range(8))): f(a))

# the real op: separable 5-tap blur + decimate, current impl vs conv
from maskfusion_tpu.ops import preprocess as pp

timeit("pyr_down_gauss_depth (current)",
       lambda f=jax.jit(lambda x: jnp.sum(pp.pyr_down_gauss_depth(x))): f(a))

_B5 = np.array([1., 4., 6., 4., 1.], np.float32) / 16.0


def pyr_conv(x):
    v = jnp.where(jnp.isfinite(x) & (x > 0), x, 0.0)
    wv = (jnp.isfinite(x) & (x > 0)).astype(jnp.float32)
    ky = jnp.asarray(_B5).reshape(1, 1, 5, 1)
    kx = jnp.asarray(_B5).reshape(1, 1, 1, 5)

    def sep(img):
        y = jax.lax.conv_general_dilated(
            img[None, None], ky, window_strides=(2, 1), padding=((2, 2), (0, 0)))
        y = jax.lax.conv_general_dilated(
            y, kx, window_strides=(1, 2), padding=((0, 0), (2, 2)))
        return y[0, 0]

    sv, sw = sep(v), sep(wv)
    return jnp.where(sw > 0, sv / jnp.maximum(sw, 1e-20), 0.0)


timeit("pyr_down via strided conv",
       lambda f=jax.jit(lambda x: jnp.sum(pyr_conv(x))): f(a))

# parity subgrid extraction (fuse pass 2): 14 fields
timeit("parity subgrid [0::2,0::2] x14",
       lambda f=jax.jit(lambda x: sum(jnp.sum((x + i)[0::2, 0::2])
                                      for i in range(14))): f(a))
timeit("parity subgrid via conv x14",
       lambda f=jax.jit(lambda x: sum(jnp.sum(conv_dec(x + i))
                                      for i in range(14))): f(a))
