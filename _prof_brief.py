import time, jax, jax.numpy as jnp
from putslam_tpu.config import tum_fr1_config
from putslam_tpu.io import synthetic
from putslam_tpu.ops import fast as fast_mod, brief as brief_mod
cfg = tum_fr1_config(); det = cfg.detector
poses = synthetic.orbit_trajectory(4, radius=0.10, yaw_amp=0.1)
grays, _ = synthetic.render_sequence(cfg.camera, poses)
g = jax.block_until_ready(grays[0])
def timeit(name, fn, *args, reps=30):
    t0=time.time(); out = jax.block_until_ready(fn(*args)); c=time.time()-t0
    t0 = time.time()
    for _ in range(reps): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.time()-t0)/reps*1e3:8.3f} ms   (compile {c:.1f}s)", flush=True)
    return out
uv, resp, valid = jax.block_until_ready(jax.jit(lambda g: fast_mod.detect(g, det.fast_threshold, det.nms_radius, det.grid_rows, det.grid_cols, det.max_features))(g))
sm = timeit("box_blur", jax.jit(brief_mod.box_blur), g)
patches = timeit("extract_patches", jax.jit(brief_mod.extract_patches), sm, uv)
ang = timeit("orientations", jax.jit(brief_mod.orientations), patches)
timeit("steered_brief", jax.jit(lambda p, a: brief_mod.steered_brief(p, a)), patches, ang)
timeit("describe (all)", jax.jit(lambda g, uv, v: brief_mod.describe(g, uv, v)), g, uv, valid)
