"""Characterise frame-upload cost on the remote transport (static-FPS lever:
the r4 stage probe measured upload+consume at ~18 ms net vs a ~50 ms stage
sum, i.e. ~25% of the static frame IF it doesn't overlap compute).

Questions answered:
1. does device_put block the host?             (host return time)
2. raw transfer time                            (device_put + block)
3. is it per-RPC overhead or bandwidth?         (packed single buffer)
4. does the transfer overlap device compute?    (dispatch-then-upload)
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

W, H = 640, 480
rgb = np.random.randint(0, 255, (H, W, 3), np.uint8)
depth = np.random.randint(500, 5000, (H, W), np.uint16)
packed = np.empty(rgb.nbytes + depth.nbytes, np.uint8)
N = 24


def timeit(name, fn, n=N):
    fn()
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return dt


consume = jax.jit(lambda r, d: jnp.sum(r.astype(jnp.float32))
                  + jnp.sum(d.astype(jnp.float32)))
consume1 = jax.jit(lambda p: jnp.sum(p.astype(jnp.float32)))

# compute-heavy kernel ~20 ms: big matmul chain
A = jax.block_until_ready(jnp.ones((4096, 4096), jnp.bfloat16))


@jax.jit
def heavy(a):
    for _ in range(24):
        a = a @ a * 1e-3
    return jnp.sum(a.astype(jnp.float32))


timeit("floor (tiny dispatch+get)", lambda: consume1(jnp.float32(1.0)))
t_heavy = timeit("heavy compute alone", lambda: heavy(A))

# 1. host return time of device_put (no consume, no block)
t0 = time.perf_counter()
puts = []
for _ in range(N):
    puts.append((jax.device_put(rgb), jax.device_put(depth)))
t_ret = (time.perf_counter() - t0) / N * 1000
jax.block_until_ready(puts[-1])
print(f"{'device_put host-return (rgb+depth)':52s} {t_ret:8.2f} ms",
      flush=True)

# 2. full transfer + consume (two buffers)
timeit("device_put rgb+depth + consume",
       lambda: consume(jax.device_put(rgb), jax.device_put(depth)))


# 3. packed single buffer
def packed_upload():
    packed[:rgb.nbytes] = rgb.reshape(-1).view(np.uint8)
    packed[rgb.nbytes:] = depth.reshape(-1).view(np.uint8)
    return consume1(jax.device_put(packed))


timeit("packed 1.5MB single device_put + consume", packed_upload)


# 4. overlap: dispatch heavy FIRST, then upload, then consume both —
#    if transfers overlap compute, total ~= max(heavy, upload), else sum
def overlapped():
    h = heavy(A)
    r = jax.device_put(rgb)
    d = jax.device_put(depth)
    return h, consume(r, d)


t_ov = timeit("heavy dispatch THEN upload+consume", overlapped)
print(f"-> overlap verdict: total {t_ov:.1f} vs heavy {t_heavy:.1f} "
      f"(sum would be ~{t_heavy + 18:.0f})", flush=True)
