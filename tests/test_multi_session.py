import pytest

pytestmark = pytest.mark.slow
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from putslam_tpu.config import tiny_test_config, LoopClosureConfig
from putslam_tpu.io import synthetic
from putslam_tpu.models import slam
from putslam_tpu.parallel import mesh as mesh_mod, multi_session


def lc_cfg():
    cfg = tiny_test_config()
    return cfg.replace(
        map=dataclasses.replace(cfg.map,
                                add_features_when_measurements_less_than=10,
                                min_keyframe_matches=10),
        loop_closure=LoopClosureConfig(enabled=True, vocab_size=128,
                                       tail_skip=8, min_probability=0.05,
                                       min_features_lc=10, queue_capacity=16))


def run_session(cfg, n, radius, seed, phase=0.0):
    poses = synthetic.orbit_trajectory(n, radius=radius, yaw_amp=0.1)
    grays, depths = synthetic.render_sequence(cfg.camera, poses)
    est, outs, state = slam.run_slam(cfg, np.asarray(grays), np.asarray(depths),
                                     init_pose=np.asarray(poses[0]), seed=seed)
    return state, np.asarray(poses), est


def test_merge_and_joint_optimize():
    cfg = lc_cfg()
    # two sessions exploring the same world with different trajectories
    s1, gt1, est1 = run_session(cfg, 14, 0.12, seed=0)
    s2, gt2, est2 = run_session(cfg, 14, 0.18, seed=1)
    states = [s1, s2]
    merged = multi_session.merge_sessions(cfg, states)
    K = s1.map.kf_pose.shape[0]
    assert merged.kf_pose.shape == (2 * K, 7)
    assert int(merged.kf_valid.sum()) == int(s1.map.kf_valid.sum()) + \
        int(s2.map.kf_valid.sum())
    assert int(merged.graph.obs_valid.sum()) == \
        int(s1.graph.obs_valid.sum()) + int(s2.graph.obs_valid.sum())
    # session-1 observation indices offset correctly
    assert int(merged.anchors[0]) < K <= int(merged.anchors[1])

    g2, n_edges = multi_session.find_cross_session_closures(
        cfg, merged, states, jax.random.PRNGKey(0))
    # same world, heavy overlap: expect at least one verified closure
    assert n_edges >= 1, n_edges

    mesh = mesh_mod.make_mesh(8, axis="lm")
    kf_out, lm_out, chi2 = multi_session.joint_optimize(
        cfg, mesh, merged, g2, n_edges)
    assert np.isfinite(np.asarray(kf_out)).all()
    assert np.isfinite(np.asarray(chi2)).all()
    # joint BA should not blow up the residual
    chi = np.asarray(chi2)
    assert chi[-1] <= chi[0] * 1.05


def test_four_session_stretch():
    """BASELINE.json stretch configuration: 4 sequences jointly optimized.
    Exercises the fully-batched cross-session closure search (one einsum
    over all B·(B−1)/2 pairs, one vmapped verification) and the distributed
    joint BA over the merged problem."""
    cfg = lc_cfg()
    states = []
    for b, radius in enumerate((0.10, 0.13, 0.16, 0.19)):
        s, _, _ = run_session(cfg, 12, radius, seed=b)
        states.append(s)
    merged = multi_session.merge_sessions(cfg, states)
    K = states[0].map.kf_pose.shape[0]
    assert merged.kf_pose.shape == (4 * K, 7)
    assert merged.kf_gen.shape == (4 * K,)
    assert int(merged.kf_valid.sum()) == sum(
        int(s.map.kf_valid.sum()) for s in states)

    g2, n_edges = multi_session.find_cross_session_closures(
        cfg, merged, states, jax.random.PRNGKey(0))
    # four orbits of the same room at nearby radii overlap heavily —
    # several of the 6 session pairs must close
    assert n_edges >= 2, n_edges

    mesh = mesh_mod.make_mesh(8, axis="lm")
    kf_out, lm_out, chi2 = multi_session.joint_optimize(
        cfg, mesh, merged, g2, n_edges)
    assert np.isfinite(np.asarray(kf_out)).all()
    chi = np.asarray(chi2)
    assert np.isfinite(chi).all()
    assert chi[-1] <= chi[0] * 1.05
