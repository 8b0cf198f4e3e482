import time
import jax, jax.numpy as jnp, numpy as np
from putslam_tpu.config import tum_fr1_config
from putslam_tpu.io import synthetic
from putslam_tpu.ops import fast as fast_mod

T = 64
def fetch(x): np.asarray(jax.tree.leaves(x)[0]).ravel()[0]
def timeit(name, fn, *args, reps=10):
    out = fn(*args); fetch(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        fetch(out)
        best = min(best, (time.time() - t0) / reps)
    print(f"{name:40s} {best*1e3:9.2f} ms/call {best/T*1e3:8.3f} ms/frame", flush=True)

cfg = tum_fr1_config()
det = cfg.detector
poses = synthetic.orbit_trajectory(T, radius=0.10, yaw_amp=0.1)
grays, depths = synthetic.render_sequence(cfg.camera, poses)
fetch(grays)

def ch(fn):
    return jax.jit(lambda g: jax.lax.map(fn, g, batch_size=4))

timeit("score_map -> scalar", ch(lambda im: jnp.sum(fast_mod.fast_score_map(im, det.fast_threshold))), grays)
timeit("score+nms -> scalar", ch(lambda im: jnp.sum(fast_mod.nms(fast_mod.fast_score_map(im, det.fast_threshold), det.nms_radius))), grays)
def full(im):
    uv, resp, valid = fast_mod.detect(im, det.fast_threshold, det.nms_radius,
                                      det.grid_rows, det.grid_cols, det.max_features)
    return jnp.sum(uv)
timeit("full detect -> scalar", ch(full), grays)
