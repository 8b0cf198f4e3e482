#!/usr/bin/env python
"""Per-stage device-time profile of the VO front-end on the current backend.

Timing protocol: on tunneled/remote TPU backends ``jax.block_until_ready``
can return before execution finishes, and a host fetch costs a ~25 ms round
trip. Honest numbers therefore come from queueing BATCHED work (many frames
per dispatch, amortizing dispatch latency) and fencing with ONE fetch of the
last output (the device stream executes in order). Single-op single-frame
timings are meaningless below the dispatch floor — don't add them back.

Run on the TPU chip (default backend) or forced CPU (JAX_PLATFORMS=cpu).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from putslam_tpu.config import tum_fr1_config
from putslam_tpu.io import synthetic
from putslam_tpu.models import vo
from putslam_tpu.ops import brief as brief_mod
from putslam_tpu.ops import fast as fast_mod

T = 64  # frames per dispatch


def fetch(out):
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]


def measure(fn, *args, reps=10):
    out = fn(*args)
    fetch(out)  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        fetch(out)
        best = min(best, (time.time() - t0) / reps)
    return best


def timeit(name, fn, *args, per=T, reps=10):
    s = measure(fn, *args, reps=reps)
    print(f"{name:36s} {s * 1e3:9.2f} ms/call {s / per * 1e3:8.3f} ms/frame",
          flush=True)


def main():
    cfg = tum_fr1_config()
    det = cfg.detector
    poses = synthetic.orbit_trajectory(T, radius=0.10, yaw_amp=0.1)
    grays, depths = synthetic.render_sequence(cfg.camera, poses)
    fetch(grays)
    key = jax.random.PRNGKey(0)
    print(f"backend: {jax.default_backend()}   devices: {len(jax.devices())}",
          flush=True)

    timeit("vo_sequence (end-to-end)",
           jax.jit(lambda g, d, k: vo.vo_sequence(cfg, g, d, k)),
           grays, depths, key)

    dseq = jax.jit(lambda g, d: vo.detect_sequence(cfg, g, d))
    feats = dseq(grays, depths)
    fetch(feats.uv)
    timeit("detect_sequence (all levels)", dseq, grays, depths)

    bd = jax.jit(lambda g: jax.vmap(lambda im: fast_mod.detect(
        im, det.fast_threshold, det.nms_radius, det.grid_rows,
        det.grid_cols, det.max_features))(g))
    timeit("fast.detect (level 0)", bd, grays)

    def desc_one(im, uv1):
        return brief_mod.describe_patches(brief_mod.extract_patches(im, uv1))
    bdsc = jax.jit(lambda g, u: jax.vmap(desc_one)(g, u))
    timeit("extract+describe (level 0)", bdsc, grays, feats.uv)

    prev = jax.tree.map(lambda x: x[:-1], feats)
    curr = jax.tree.map(lambda x: x[1:], feats)
    keys = jax.random.split(key, T - 1)
    bstep = jax.jit(lambda k, a, b: jax.vmap(
        lambda kk, aa, bb: vo.vo_step(cfg, kk, aa, bb))(k, a, b))
    timeit("vo_step (match+ransac)", bstep, keys, prev, curr, per=T - 1)


if __name__ == "__main__":
    main()
