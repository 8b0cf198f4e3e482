import time, jax, jax.numpy as jnp
from putslam_tpu.config import tum_fr1_config
from putslam_tpu.io import synthetic
from putslam_tpu.ops import fast as fast_mod, brief as brief_mod
from putslam_tpu.geometry import camera as camera_mod

cfg = tum_fr1_config(); det = cfg.detector
poses = synthetic.orbit_trajectory(4, radius=0.10, yaw_amp=0.1)
grays, depths = synthetic.render_sequence(cfg.camera, poses)
g = jax.block_until_ready(grays[0]); d = jax.block_until_ready(depths[0])

def timeit(name, fn, *args, reps=50):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.time()-t0)/reps*1e3:8.3f} ms")
    return out

@jax.jit
def upto_topk(g):
    raw = fast_mod.fast_score_map(g, det.fast_threshold)
    s = fast_mod.nms(raw, det.nms_radius)
    return fast_mod.grid_topk(s, det.grid_rows, det.grid_cols, det.max_features)
uv, resp, valid = timeit("score+nms+topk", upto_topk, g)

@jax.jit
def with_subpix(g):
    raw = fast_mod.fast_score_map(g, det.fast_threshold)
    s = fast_mod.nms(raw, det.nms_radius)
    uv, resp, valid = fast_mod.grid_topk(s, det.grid_rows, det.grid_cols, det.max_features)
    return jnp.where(valid[:, None], fast_mod.subpixel_refine(raw, uv), uv), resp, valid
timeit("  + subpixel", with_subpix, g)

timeit("brief.describe", jax.jit(brief_mod.describe), g, uv, valid)
timeit("sample_depth", jax.jit(lambda d, uv: camera_mod.sample_depth(d, uv)), d, uv)
