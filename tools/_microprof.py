import time
import jax, jax.numpy as jnp, numpy as np
from putslam_tpu.config import tum_fr1_config
from putslam_tpu.io import synthetic
from putslam_tpu.models import vo
from putslam_tpu.ops import brief as brief_mod
from putslam_tpu.ops import fast as fast_mod
from putslam_tpu.ops import matching as match_mod

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
    print(f"{name:40s} {best*1e3:9.2f} ms/call {best/per*1e3:8.3f} ms/frame", flush=True)

cfg = tum_fr1_config()
det = cfg.detector
poses = synthetic.orbit_trajectory(T, radius=0.10, yaw_amp=0.1)
grays, depths = synthetic.render_sequence(cfg.camera, poses)
fetch(grays)
key = jax.random.PRNGKey(0)
print("backend:", jax.default_backend())

dseq = jax.jit(lambda g, d: vo.detect_sequence(cfg, g, d))
feats = dseq(grays, depths); fetch(feats.uv)

# patch extraction alone
bext = jax.jit(lambda g, u: jax.vmap(brief_mod.extract_patches)(g, u))
patches = bext(grays, feats.uv); fetch(patches)
timeit("extract_patches", bext, grays, feats.uv)

# describe alone
bdesc = jax.jit(lambda p: jax.vmap(brief_mod.describe_patches)(p))
timeit("describe_patches", bdesc, patches)

# fast detect per level
bd = jax.jit(lambda g: jax.vmap(lambda im: fast_mod.detect(
    im, det.fast_threshold, det.nms_radius, det.grid_rows,
    det.grid_cols, det.max_features))(g))
timeit("fast.detect L0", bd, grays)

# vo_step parts: match + ransac — inspect vo module for names
prev = jax.tree.map(lambda x: x[:-1], feats)
curr = jax.tree.map(lambda x: x[1:], feats)
keys = jax.random.split(key, T - 1)
bstep = jax.jit(lambda k, a, b: jax.vmap(
    lambda kk, aa, bb: vo.vo_step(cfg, kk, aa, bb))(k, a, b))
timeit("vo_step", bstep, keys, prev, curr, per=T-1)

# matching alone
bmatch = jax.jit(lambda a, b, va, vb: jax.vmap(match_mod.cross_check_match)(a, b, va, vb))
try:
    m = bmatch(prev.desc, curr.desc, prev.valid, curr.valid); fetch(m)
    timeit("cross_check_match", bmatch, prev.desc, curr.desc, prev.valid, curr.valid, per=T-1)
except Exception as e:
    print("match profile skipped:", e)
