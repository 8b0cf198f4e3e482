#!/usr/bin/env python
"""Per-stage device-time profile of the full SLAM step on the current
backend (TPU or CPU).

Each stage is timed as a jitted scan of dependent iterations (the carry
feeds back into the stage input) at TWO scan lengths, and the reported
time is the MARGINAL SLOPE between them: a single-length measurement
divides the ~24 ms tunnel dispatch+fetch floor by the rep count, which
silently adds ~0.5-1 ms to every stage (round-4's "front-end bound"
conclusion was exactly this artifact — round-5 postmortem in
BENCH_DETAIL.json). Reports a stage table plus an MXU-utilization
estimate for the largest matmul.

Reference stage taxonomy: src/PUTSLAM/TimeMeasurement.h (detection /
description / matching / RANSAC / map ops / optimization), so the table is
comparable with the reference's times.txt.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from putslam_tpu.config import tum_fr1_config
    from putslam_tpu.io import synthetic
    from putslam_tpu.models import slam, vo as vo_mod
    from putslam_tpu.slam_map import features_map as fm
    from putslam_tpu.frontend.detector import detect_and_describe
    from putslam_tpu.frontend import ransac as ransac_mod
    from putslam_tpu.backend import optimize as opt_mod
    from putslam_tpu.geometry import se3

    cfg = tum_fr1_config()
    poses = synthetic.orbit_trajectory(8, radius=0.10, yaw_amp=0.1)
    grays, depths = synthetic.render_sequence(cfg.camera, poses)
    g_img = jnp.asarray(grays)
    d_img = jnp.asarray(depths)

    # build a realistic mid-run state by running a few steps
    state = slam.slam_init(cfg, g_img[0], d_img[0])
    for i in range(1, 6):
        state, _ = slam.slam_step(cfg, state, g_img[i], d_img[i])
    jax.block_until_ready(state.pose)
    feat = detect_and_describe(cfg, g_img[6], d_img[6])
    prev = detect_and_describe(cfg, g_img[5], d_img[5])
    key = jax.random.PRNGKey(0)

    reps = args.reps
    results = {}

    def timeit(name, fn, *xs, scale_inputs=None):
        """Marginal-slope timing: two dependent-eval scan lengths R0 < R1,
        report (t(R1) − t(R0)) / (R1 − R0).

        Every float32 leaf of the inputs is perturbed by the (always ~0)
        carry so the computation depends on the previous iteration — without
        this, XLA hoists the loop-invariant body out of the scan and the
        measurement collapses to overhead. The two-length slope cancels the
        per-call dispatch+fetch floor of tunneled backends."""
        R0, R1 = max(reps // 4, 4), reps

        def mkloop(length):
            def loop(*ys):
                def body(c, _):
                    def bump(leaf):
                        if isinstance(leaf, jnp.ndarray) and \
                                leaf.dtype == jnp.float32:
                            return leaf + c * 1e-30
                        return leaf

                    zs = jax.tree.map(bump, ys)
                    out = fn(*zs)
                    acc = jnp.float32(0.0)
                    for leaf in jax.tree.leaves(out):
                        if isinstance(leaf, jnp.ndarray) and \
                                leaf.dtype == jnp.float32:
                            acc = acc + jnp.sum(leaf) * 1e-30
                    return c + acc, None

                out, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                      length=length)
                return out

            return jax.jit(loop)

        jf0, jf1 = mkloop(R0), mkloop(R1)
        t0 = time.time()
        np.asarray(jf0(*xs))
        np.asarray(jf1(*xs))
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(3):
            ta = time.time(); np.asarray(jf0(*xs)); ta = time.time() - ta
            tb = time.time(); np.asarray(jf1(*xs)); tb = time.time() - tb
            best = min(best, (tb - ta) / (R1 - R0))
        ms = 1000.0 * best
        results[name] = {"ms": round(ms, 3), "compile_s": round(compile_s, 1)}
        print(f"{name:28s} {ms:8.3f} ms   (compile {compile_s:.1f}s)",
              flush=True)

    # --- front-end -------------------------------------------------------
    timeit("detect_describe",
           functools.partial(detect_and_describe, cfg), g_img[6], d_img[6])
    timeit("vo_match_ransac",
           functools.partial(vo_mod.vo_step, cfg), key, prev, feat)
    timeit("guided_match",
           lambda m, p, f: fm.guided_match(cfg, m, p, f),
           state.map, state.pose, feat)
    gm = fm.guided_match(cfg, state.map, state.pose, feat)
    p_cam = feat.xyz[jnp.clip(gm.feat_idx, 0, feat.capacity - 1)]
    timeit("map_ransac",
           lambda k, p, q, v: ransac_mod.estimate(cfg.ransac, cfg.camera,
                                                  k, p, q, v),
           key, p_cam, state.map.lm_pos, gm.valid)

    # --- map bookkeeping (the branchless keyframe path) ------------------
    def bookkeeping(m, pose, f, gmv):
        m2, kf_idx = fm.add_keyframe(cfg, m, pose, jnp.float32(0.5))
        m2 = fm.update_matched_landmarks(cfg, m2, pose, f,
                                         gm._replace(valid=gmv), m.n_kf)
        m2 = fm.add_landmarks(cfg, m2, pose, f,
                              jnp.zeros((f.capacity,), bool), m.n_kf)
        return m2

    timeit("map_bookkeeping", bookkeeping, state.map, state.pose, feat,
           gm.valid)

    # --- graph append ----------------------------------------------------
    from putslam_tpu.backend import graph as graph_mod

    def append(gst, m, pose):
        L = m.lm_pos.shape[0]
        gst = graph_mod.add_observations(
            gst, jnp.zeros((L,), jnp.int32), jnp.arange(L, dtype=jnp.int32),
            jnp.zeros((L, 3)), jnp.ones((L,)), m.lm_valid,
            gen=m.lm_gen, kf_gen=jnp.zeros((L,), jnp.int32))
        return graph_mod.add_pose_pose(gst, 0, 1, se3.identity(), 1.0, True)

    timeit("graph_append", append, state.graph, state.map, state.pose)

    # --- bundle adjustment (one call, configured iterations) -------------
    def ba(m, gst):
        fixed = fm.active_window_fixed(m, cfg.map.max_frames_window)
        fixed = fixed.at[0].set(True)
        res = opt_mod.optimize_graph(
            cfg.backend, m.kf_pose, m.kf_valid, m.lm_pos, m.lm_valid, gst,
            fixed, lm_gen=m.lm_gen, kf_gen=m.kf_gen, cam=cfg.camera)
        return res.kf_pose, res.lm_pos, res.chi2

    timeit("ba_call", ba, state.map, state.graph, scale_inputs=None)

    # --- whole step ------------------------------------------------------
    def step(st, gi, di):
        st2, outs = slam.slam_step(cfg, st, gi, di)
        return st2

    timeit("full_slam_step", step, state, g_img[6], d_img[6])

    # --- MXU utilization estimates ---------------------------------------
    # guided match: (N,256)x(256,L*D) bf16
    N = cfg.detector.max_features
    L = cfg.map.max_landmarks
    D = cfg.map.descriptor_views
    K = cfg.map.max_keyframes
    M = cfg.backend.max_observations
    gm_flops = 2 * N * 256 * L * D
    peak_bf16 = 197e12  # v5e chip peak
    gm_ms = results["guided_match"]["ms"]
    results["mxu_estimates"] = {
        "guided_match_matmul_gflop": round(gm_flops / 1e9, 1),
        # below ~0.05 ms the marginal-slope measurement is inside its own
        # noise band — a utilization ratio would be meaningless
        "guided_match_util_pct_upper": (round(
            100 * gm_flops / (gm_ms / 1e3) / peak_bf16, 1)
            if gm_ms > 0.05 else "below-measurement-noise"),
        "ba_G_matmul_gflop": round(2 * M * 18 * K * L / 1e9, 1),
        "ba_schur_matmul_gflop": round(2 * (K * 6) ** 2 * L * 3 / 1e9, 1),
    }
    print(json.dumps(results["mxu_estimates"]), flush=True)

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
