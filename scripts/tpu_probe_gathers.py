"""Isolate the random row-gather costs inside the static step's predict
path: keep-bit gather, attribute gather, revalidation gather — at the real
sizes (P=307200 pixel queries, tables 409600-719k rows).  Also measures the
same gathers at f16 and a monotone (sorted-query) variant to see what the
lowering rewards.  Run alone on the TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

P = 307200
N = 409600
rng = np.random.default_rng(0)
src_np = rng.integers(0, N, P).astype(np.int32)
src = jnp.asarray(src_np)
src_sorted = jnp.asarray(np.sort(src_np))
tab1 = jnp.asarray(rng.standard_normal((N,)).astype(np.float32))
tab5 = jnp.asarray(rng.standard_normal((N, 5)).astype(np.float32))
tab8 = jnp.asarray(rng.standard_normal((N, 8)).astype(np.float32))
tab13 = jnp.asarray(rng.standard_normal((N, 13)).astype(np.float32))
tab16 = jnp.asarray(rng.standard_normal((N, 16)).astype(np.float32))
tab8h = tab8.astype(jnp.float16)
keep = jnp.asarray(rng.integers(0, 2, N).astype(bool))


def timeit(name, jfn, n=48):
    o = jfn()
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = jfn()
    jax.device_get(o)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return dt


nothing = jax.jit(lambda x: x + 1.0)
timeit("floor", lambda: nothing(jnp.float32(1.0)))

g1 = jax.jit(lambda t, s: jnp.sum(t[s]))
timeit("gather (N,) f32 x 307200", lambda: g1(tab1, src))
gk = jax.jit(lambda t, s: jnp.sum(t[s].astype(jnp.float32)))
timeit("gather (N,) bool x 307200 (keep)", lambda: gk(keep, src))
g5 = jax.jit(lambda t, s: jnp.sum(t[s]))
timeit("gather (N,5) f32 rows (attr)", lambda: g5(tab5, src))
timeit("gather (N,8) f32 rows", lambda: g5(tab8, src))
timeit("gather (N,13) f32 rows", lambda: g5(tab13, src))
timeit("gather (N,16) f32 rows", lambda: g5(tab16, src))
g8h = jax.jit(lambda t, s: jnp.sum(t[s].astype(jnp.float32)))
timeit("gather (N,8) f16 rows", lambda: g8h(tab8h, src))
timeit("gather (N,8) f32 SORTED queries", lambda: g5(tab8, src_sorted))

