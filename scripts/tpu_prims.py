"""Cost model probes: gather/sort/cumsum at surfel scales on TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

def bench(name, fn, *args, n=5):
    f = jax.jit(fn)
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*args); jax.block_until_ready(o)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:8.2f} ms", flush=True)

rng = np.random.default_rng(0)
for N in (1<<19, 1<<22):
    tag = f"N={N>>10}k"
    idx = jnp.asarray(rng.integers(0, 307200, N).astype(np.int32))
    tbl = jnp.asarray(rng.random((307201,), dtype=np.float32))
    tbl8 = jnp.asarray(rng.random((307201, 8), dtype=np.float32))
    x = jnp.asarray(rng.random((N,), dtype=np.float32))
    k = jnp.asarray(rng.integers(0, 307200, N).astype(np.int32))
    bench(f"{tag} scalar gather", lambda i: tbl[i], idx)
    bench(f"{tag} row-gather (8 wide)", lambda i: tbl8[i], idx)
    bench(f"{tag} 5x scalar gather", lambda i: (tbl[i], tbl[i+1], tbl[i+2], tbl[i+3], tbl[i+4]), idx)
    bench(f"{tag} sort 1key+1val", lambda a, b: jax.lax.sort((a, b), num_keys=1), k, x)
    bench(f"{tag} sort 2key+1val", lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2), k, x, idx)
    bench(f"{tag} cumsum", lambda a: jnp.cumsum(a), x)
    tgt = jnp.arange(307201, dtype=jnp.int32)
    sk = jnp.sort(k)
    bench(f"{tag} searchsorted(sort)", lambda s, t: jnp.searchsorted(s, t, method="sort"), sk, tgt)
    bench(f"{tag} searchsorted(scan)", lambda s, t: jnp.searchsorted(s, t), sk, tgt)
