import time
import jax, jax.numpy as jnp, numpy as np

def fetch(x): np.asarray(x).ravel()[0]

def timeit(name, fn, *args, reps=10):
    out = fn(*args); fetch(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        fetch(out)
        best = min(best, (time.time() - t0) / reps)
    return best

key = jax.random.PRNGKey(0)
for (N, K, M) in [(512, 1024, 6146), (2048, 1024, 6146), (2048, 1024, 1024),
                  (2048, 4096, 1024), (8192, 8192, 8192)]:
    a = jax.random.normal(key, (N, K), jnp.bfloat16)
    b = jax.random.normal(key, (K, M), jnp.bfloat16)
    fetch(a); fetch(b)
    mm = jax.jit(lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.bfloat16))
    t = timeit(f"mm", mm, a, b)
    fl = 2 * N * K * M
    print(f"bf16 {N}x{K}x{M}: {t*1e3:8.3f} ms  {fl/t/1e12:7.2f} TFLOP/s", flush=True)

# elementwise bandwidth probe
for sz in [(4096, 4096), (8192, 8192)]:
    x = jax.random.normal(key, sz, jnp.float32)
    fetch(x)
    f = jax.jit(lambda v: v * 1.5 + 2.0)
    t = timeit("ew", f, x)
    gb = x.size * 4 * 2 / 1e9
    print(f"elementwise {sz}: {t*1e3:8.3f} ms  {gb/t:7.1f} GB/s", flush=True)

# dispatch floor: tiny op
y = jnp.ones((8, 128), jnp.float32)
f = jax.jit(lambda v: v + 1.0)
t = timeit("tiny", f, y, reps=50)
print(f"tiny op dispatch floor: {t*1e6:.0f} us", flush=True)
