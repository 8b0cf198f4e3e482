#!/usr/bin/env python
"""End-to-end SLAM throughput benchmark on one TPU chip.

Headline: the FULL SLAM step — FAST detect → steered-BRIEF describe → MXU
Hamming VO matching → 1024-hypothesis RANSAC → guided map matching
(matchXYZ) with retry ladder → absolute-pose RANSAC → keyframe/landmark
bookkeeping → graph append → bundle adjustment every 5 keyframes
(dense-Schur-MM solver) — at the reference's fr1_desk operating point
(640×480, ≤512 features, 8192-landmark map; BASELINE.md) over a synthetic
on-device RGB-D sequence. This is the reference's front-end hot loop plus
its optimization thread, measured together (PUTSLAM.cpp:677-930 +
featuresMap.cpp:881-1026; fps recorded at :1056-1061).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Detail (VO-only fps, per-frame ms, BA cadence, ATE sanity) goes to stderr
and BENCH_DETAIL.json. Per-stage device times: tools/profile_slam.py.

vs_baseline: the reference was BUILT AND MEASURED on this machine in round 4
(BASELINE.md): 2.04 fps end-to-end on the identical 640-frame disk sequence
(fps.res, its own default operating point). That measured number is the
denominator. The reference's *published design point* is ~30 Hz real-time on
a desktop CPU with frame dropping; the ratio against that assumption is
reported as vs_design_point in BENCH_DETAIL for context.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from putslam_tpu.config import tum_fr1_config
from putslam_tpu.eval import ate
from putslam_tpu.io import synthetic
from putslam_tpu.models import slam, vo

REFERENCE_FPS = 2.04       # measured: reference binary on this host (BASELINE.md)
DESIGN_POINT_FPS = 30.0    # the reference's published real-time design point
N_FRAMES = 64
N_TIMED_REPS = 4   # sequential runs per timing, fetch once (the device
                   # stream executes in order, so the final fetch fences all
                   # reps — amortizes tunnel dispatch/fetch latency)


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
    g = jnp.asarray(grays)
    d = jnp.asarray(depths)
    gt = np.asarray(poses)

    # ---- full SLAM (flagship) ------------------------------------------
    state = slam.slam_init(cfg, g[0], d[0], jnp.asarray(gt[0]))
    st, outs = slam.slam_sequence(cfg, state, g[1:], d[1:])  # compile + warm
    _fetch(outs.pose)
    slam_best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(N_TIMED_REPS):
            st, outs = slam.slam_sequence(cfg, state, g[1:], d[1:])
        _fetch(outs.pose)
        slam_best = min(slam_best, (time.time() - t0) / N_TIMED_REPS)
    slam_fps = (N_FRAMES - 1) / slam_best

    est = np.concatenate([gt[:1], np.asarray(outs.pose)], axis=0)
    ate_m = ate.ate_rmse_aligned_frames(gt, est)

    # ---- VO-only (front-end ceiling, round-2 headline) ------------------
    key = jax.random.PRNGKey(0)
    est_vo, _ = vo.vo_sequence(cfg, g, d, key)
    _fetch(est_vo)
    vo_best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(N_TIMED_REPS):
            est_vo, _ = vo.vo_sequence(cfg, g, d, key)
        _fetch(est_vo)
        vo_best = min(vo_best, (time.time() - t0) / N_TIMED_REPS)
    vo_fps = (N_FRAMES - 1) / vo_best

    detail = {
        "slam_fps": round(slam_fps, 2),
        "slam_ms_per_frame": round(1000.0 * slam_best / (N_FRAMES - 1), 3),
        "vo_fps": round(vo_fps, 2),
        "n_keyframes": int(np.asarray(st.map.n_kf)),
        "n_ba_calls": int(np.asarray(outs.ba_ran).sum()),
        "n_landmarks": int(np.asarray(st.map.lm_valid).sum()),
        "ate_rmse_m": round(float(ate_m), 5),
        "frames": N_FRAMES,
        "vs_measured_reference": round(slam_fps / REFERENCE_FPS, 2),
        "vs_design_point_30fps": round(slam_fps / DESIGN_POINT_FPS, 2),
        "solver": cfg.backend.solver,
        "note": "synthetic 640x480 orbit; every-frame-keyframe worst case "
                "(covisibility drops each frame), BA every 5 keyframes",
    }
    print(json.dumps(detail), file=sys.stderr)
    try:
        # merge-preserve auxiliary sections (e.g. the round-5 profile
        # table) that other tools record into the same file
        try:
            prev = json.load(open("BENCH_DETAIL.json"))
            for k, v in prev.items():
                if k not in detail:
                    detail[k] = v
        except Exception:
            pass
        with open("BENCH_DETAIL.json", "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass

    print(json.dumps({
        "metric": "slam_frames_per_sec_640x480_1chip",
        "value": round(slam_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(slam_fps / REFERENCE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
