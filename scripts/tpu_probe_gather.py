"""Does index locality speed up TPU row-gathers?  Decides whether clean's
window gather is worth a sort-by-pixel reordering."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

N = 409600          # bucket rows
P = 307200          # table rows (H*W)
table16 = jnp.asarray(np.random.rand(P, 64).astype(np.float16))
table32 = jnp.asarray(np.random.rand(P, 32).astype(np.float32))
idx_rand = jnp.asarray(np.random.randint(0, P, N).astype(np.int32))
idx_sort = jnp.sort(idx_rand)


def timeit(name, jfn, N_it=48):
    o = jfn()
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for i in range(N_it):
        o = jfn()
    jax.device_get(o)
    print(f"{name:38s} {(time.perf_counter()-t0)/N_it*1000:8.2f} ms", flush=True)


g16 = jax.jit(lambda t, i: jnp.sum(t[i].astype(jnp.float32)))
timeit("gather 64wide f16 random", lambda: g16(table16, idx_rand))
timeit("gather 64wide f16 sorted", lambda: g16(table16, idx_sort))
g32 = jax.jit(lambda t, i: jnp.sum(t[i]))
timeit("gather 32wide f32 random", lambda: g32(table32, idx_rand))
timeit("gather 32wide f32 sorted", lambda: g32(table32, idx_sort))
g8 = jax.jit(lambda t, i: jnp.sum(t[:, :8][i]))
timeit("gather 8wide f32 random", lambda: g8(table32, idx_rand))
g1 = jax.jit(lambda t, i: jnp.sum(t[:, 0][i]))
timeit("gather 1wide f32 random", lambda: g1(table32, idx_rand))

# cost of the sort that would buy the locality (11 payload operands)
pay = [jnp.asarray(np.random.rand(N).astype(np.float32)) for _ in range(11)]
s1 = jax.jit(lambda i, *p: jnp.sum(jax.lax.sort((i,) + p, num_keys=1)[1]))
timeit("sort 409600 x 11 payload", lambda: s1(idx_rand, *pay))
s2 = jax.jit(lambda i, p0: jnp.sum(jax.lax.sort((i, p0), num_keys=1)[1]))
timeit("sort 409600 x 1 payload", lambda: s2(idx_rand, pay[0]))
