import time
import jax, jax.numpy as jnp, numpy as np
from putslam_tpu.config import tum_fr1_config
from putslam_tpu.io import synthetic
from putslam_tpu.models import vo
from putslam_tpu.frontend import detector as det_mod
from putslam_tpu.ops import brief as brief_mod
from putslam_tpu.ops import fast as fast_mod
from putslam_tpu.geometry import camera as camera_mod

T = 64

def fetch(out):
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]

def timeit(name, fn, *args, per=T, reps=10):
    out = fn(*args); fetch(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        fetch(out)
        best = min(best, (time.time() - t0) / reps)
    print(f"{name:44s} {best*1e3:9.2f} ms/call {best/per*1e3:8.3f} ms/frame", flush=True)
    return best

cfg = tum_fr1_config()
det = cfg.detector
poses = synthetic.orbit_trajectory(T, radius=0.10, yaw_amp=0.1)
grays, depths = synthetic.render_sequence(cfg.camera, poses)
fetch(grays)
print("backend:", jax.default_backend(), "levels:", det.n_pyramid_levels,
      "maxfeat:", det.max_features, "budgets:", det_mod._level_budgets(cfg))

def chunked(fn, bs):
    return jax.jit(lambda g, d: jax.lax.map(lambda fr: fn(fr[0], fr[1]), (g, d),
                                            batch_size=bs))

# full detect at different chunk sizes
for bs in (4, 8, 16, 32):
    timeit(f"detect_and_describe chunk={bs}",
           chunked(lambda g, d: det_mod.detect_and_describe(cfg, g, d), bs),
           grays, depths)

# stages, chunk=8 (matching production): pyramid-only, fast-only, fast+extract
def pyramid_only(g, d):
    outs = []
    img = g
    for lvl, (Hl, Wl) in enumerate(det_mod._pyramid_shapes(cfg)):
        if lvl > 0:
            img = jax.image.resize(g, (Hl, Wl), method="linear")
        outs.append(jnp.sum(img))
    return jnp.stack(outs)
timeit("pyramid resize only", chunked(pyramid_only, 8), grays, depths)

budgets = det_mod._level_budgets(cfg)
def fast_only(g, d):
    outs = []
    img = g
    for lvl, (Hl, Wl) in enumerate(det_mod._pyramid_shapes(cfg)):
        if lvl > 0:
            img = jax.image.resize(g, (Hl, Wl), method="linear")
        uv, resp, valid = fast_mod.detect(img, det.fast_threshold, det.nms_radius,
                                          det.grid_rows, det.grid_cols, budgets[lvl])
        outs.append(jnp.sum(uv))
    return jnp.stack(outs)
timeit("pyramid + fast.detect all levels", chunked(fast_only, 8), grays, depths)

def fast_extract(g, d):
    patches = []
    img = g
    for lvl, (Hl, Wl) in enumerate(det_mod._pyramid_shapes(cfg)):
        if lvl > 0:
            img = jax.image.resize(g, (Hl, Wl), method="linear")
        uv, resp, valid = fast_mod.detect(img, det.fast_threshold, det.nms_radius,
                                          det.grid_rows, det.grid_cols, budgets[lvl])
        patches.append(brief_mod.extract_patches(img, uv))
    return jnp.concatenate(patches)
timeit("  + extract_patches", chunked(fast_extract, 8), grays, depths)

def fast_extract_desc(g, d):
    p = fast_extract(g, d)
    return brief_mod.describe_patches(p, kind=det.descriptor)[0]
timeit("  + describe_patches", chunked(fast_extract_desc, 8), grays, depths)
