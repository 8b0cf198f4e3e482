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
    print(f"{name:44s} {best*1e3:9.3f} ms", flush=True)
    return best

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (4096, 4096), jnp.float32)
fetch(x)

# big in, scalar out
timeit("4096^2 in -> scalar out", jax.jit(lambda v: jnp.sum(v * 1.5)), x)
# scalar in, big out, scalar-ish consumption? big out materialized on device
timeit("scalar in -> 4096^2 out", jax.jit(lambda s: jnp.full((4096, 4096), 1.0) * s), jnp.float32(2.0))
# big in, big out (reference)
timeit("4096^2 in -> 4096^2 out", jax.jit(lambda v: v * 1.5 + 2.0), x)
# chained: out of one call feeds next call (device-resident intermediate?)
f1 = jax.jit(lambda v: v * 1.5 + 2.0)
y = f1(x); fetch(y)
timeit("second call on produced buffer", f1, y)
# 20 elementwise ops fused in one jit (compute scaling)
def many(v):
    for _ in range(20):
        v = v * 1.0001 + 0.1
    return jnp.sum(v)
timeit("20 fused ew -> scalar", jax.jit(many), x)
