#!/usr/bin/env python
"""Per-stage device-time profile of the VO front-end on the current backend.

Consolidates the round-1 ad-hoc `_prof_*` scripts into one tool. Prints a
per-stage table (ms) for the fr1_desk operating point so kernel work can be
targeted at the real bottleneck. Run on the TPU chip (default backend) or
forced CPU (JAX_PLATFORMS=cpu).
"""

import time

import jax
import jax.numpy as jnp

from putslam_tpu.config import tum_fr1_config
from putslam_tpu.frontend import ransac as ransac_mod
from putslam_tpu.frontend.detector import detect_and_describe
from putslam_tpu.io import synthetic
from putslam_tpu.models import vo
from putslam_tpu.ops import brief as brief_mod
from putslam_tpu.ops import fast as fast_mod
from putslam_tpu.ops import matching


def timeit(name, fn, *args, reps=50):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:32s} {(time.time() - t0) / reps * 1e3:8.3f} ms")
    return out


def main():
    cfg = tum_fr1_config()
    det = cfg.detector
    poses = synthetic.orbit_trajectory(8, radius=0.10, yaw_amp=0.1)
    grays, depths = synthetic.render_sequence(cfg.camera, poses)
    grays = jax.block_until_ready(grays)
    key = jax.random.PRNGKey(0)

    print(f"backend: {jax.default_backend()}   devices: {len(jax.devices())}")

    dd = jax.jit(lambda g, d: detect_and_describe(cfg, g, d))
    f0 = timeit("detect_and_describe", dd, grays[0], depths[0])
    f1 = jax.block_until_ready(dd(grays[1], depths[1]))

    timeit("vo_step (match+ransac)", lambda k: vo.vo_step(cfg, k, f0, f1), key)

    ham = jax.jit(lambda a, b, va, vb: matching.hamming_matrix(a, b, va, vb))
    dist = timeit("hamming_matrix", ham, f0.desc, f1.desc, f0.valid, f1.valid)
    mnn = jax.jit(lambda d: matching.mutual_nn(d, cfg.matcher.max_hamming))
    m = timeit("mutual_nn", mnn, dist)

    p = f1.xyz[m.idx_b]
    q = f0.xyz
    valid = m.valid & f0.has_depth & f1.has_depth[m.idx_b]
    est = jax.jit(lambda k, pp, qq, v: ransac_mod.estimate(
        cfg.ransac, cfg.camera, k, pp, qq, v))
    timeit("ransac.estimate", est, key, p, q, valid)

    # --- detect_and_describe internals (level 0, full budget) -------------
    score = jax.jit(lambda g: fast_mod.fast_score_map(g, det.fast_threshold))
    timeit("  fast.score_map (640x480)", score, grays[0])
    df = jax.jit(lambda g: fast_mod.detect(
        g, det.fast_threshold, det.nms_radius, det.grid_rows, det.grid_cols,
        det.max_features))
    uv, resp, v = timeit("  fast.detect (640x480)", df, grays[0])
    br = jax.jit(lambda g, u, vv: brief_mod.describe(
        g, u, vv, kind=det.descriptor))
    timeit("  brief.describe", br, grays[0], uv, v)


if __name__ == "__main__":
    main()
