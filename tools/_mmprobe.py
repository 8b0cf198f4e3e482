import time
import jax, jax.numpy as jnp, numpy as np

def fetch(x): np.asarray(x).ravel()[0]

def timeit(name, fn, *args, reps=20):
    out = fn(*args); fetch(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        fetch(out)
        best = min(best, (time.time() - t0) / reps)
    print(f"{name:36s} {best*1e3:9.3f} ms", flush=True)
    return best

key = jax.random.PRNGKey(0)
N, K, M = 2048, 1024, 6146
a = jax.random.normal(key, (N, K), jnp.float32)
b = jax.random.normal(key, (K, M), jnp.float32)
a16, b16 = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
a8 = (a * 10).astype(jnp.int8)
b8 = (b * 10).astype(jnp.int8)
fetch(a8); fetch(b8)

mm16 = jax.jit(lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32))
mm8 = jax.jit(lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.int32))
t16 = timeit("bf16 matmul 2048x1024x6146", mm16, a16, b16)
t8 = timeit("int8 matmul 2048x1024x6146", mm8, a8, b8)
flops = 2 * N * K * M
print(f"bf16: {flops/t16/1e12:.1f} TFLOP/s   int8: {flops/t8/1e12:.1f} TOP/s")

# bf16 accumulating to bf16 out (less HBM out traffic)
mm16b = jax.jit(lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.bfloat16))
timeit("bf16 matmul → bf16 out", mm16b, a16, b16)
