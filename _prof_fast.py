import time, jax, jax.numpy as jnp
from putslam_tpu.config import tum_fr1_config
from putslam_tpu.io import synthetic
from putslam_tpu.ops import fast as fast_mod

cfg = tum_fr1_config(); det = cfg.detector
poses = synthetic.orbit_trajectory(4, radius=0.10, yaw_amp=0.1)
grays, _ = synthetic.render_sequence(cfg.camera, poses)
g = jax.block_until_ready(grays[0])

def timeit(name, fn, *args, reps=50):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:24s} {(time.time()-t0)/reps*1e3:8.3f} ms")
    return out

score = timeit("score_map", jax.jit(lambda g: fast_mod.fast_score_map(g, det.fast_threshold)), g)
s = timeit("nms", jax.jit(lambda s: fast_mod.nms(s, det.nms_radius)), score)
timeit("grid_topk", lambda s: fast_mod.grid_topk(s, det.grid_rows, det.grid_cols, det.max_features), s)
timeit("score+nms fused", jax.jit(lambda g: fast_mod.nms(fast_mod.fast_score_map(g, det.fast_threshold), det.nms_radius)), g)
