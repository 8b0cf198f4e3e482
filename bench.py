#!/usr/bin/env python
"""End-to-end VO throughput benchmark on one TPU chip.

Runs the flagship per-frame SLAM front-end (FAST detect → steered-BRIEF
describe → MXU Hamming match → 1024-hypothesis RANSAC) at the reference's
fr1_desk operating point (640×480, ≤512 features — BASELINE.md) over a
synthetic on-device RGB-D sequence, and reports frames/second.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md); PUTSLAM-class
feature VO runs ≈30 fps on desktop CPU (its real-time design point — the
reference drops frames to keep up with the 30 Hz TUM stream,
fileGrabber.cpp:40-160). We use 30 fps as the baseline denominator until the
reference is built & measured; the north-star target is vs_baseline ≥ 10.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from putslam_tpu.config import tum_fr1_config
from putslam_tpu.io import synthetic
from putslam_tpu.models import vo

REFERENCE_FPS = 30.0
N_FRAMES = 64
N_TIMED_REPS = 8


def _fetch(x):
    """Force a device→host round trip. On tunneled backends
    jax.block_until_ready can return before execution finishes, so honest
    timing must end with an actual output fetch (the device stream executes
    in order, so fetching the last rep's output fences all earlier reps)."""
    np.asarray(x).ravel()[0]


def main():
    cfg = tum_fr1_config()
    poses = synthetic.orbit_trajectory(N_FRAMES, radius=0.10, yaw_amp=0.1)
    grays, depths = synthetic.render_sequence(cfg.camera, poses)

    key = jax.random.PRNGKey(0)
    # compile + warm up
    est, stats = vo.vo_sequence(cfg, grays, depths, key)
    _fetch(est)
    est, stats = vo.vo_sequence(cfg, grays, depths, key)
    _fetch(est)

    times = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(N_TIMED_REPS):
            est, stats = vo.vo_sequence(cfg, grays, depths, key)
        _fetch(est)
        times.append((time.time() - t0) / N_TIMED_REPS)
    best = min(times)
    fps = (N_FRAMES - 1) / best

    print(json.dumps({
        "metric": "vo_frames_per_sec_640x480_1chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 2),
    }))
    # extra context on stderr-safe keys (single line contract kept above)


if __name__ == "__main__":
    main()
