"""Single-session loop closure, end to end.

Contract exercised (reference): candidate generation + probability-ranked
queue (src/LoopClosure/loopClosureLocal.cpp:51-125), geometric verification
and acceptance (src/Map/featuresMap.cpp:733-873,
src/Matcher/matcher.cpp:802-861). The oracle is a leave-and-return
trajectory whose return leg retraces the outbound viewpoints — the ATE drop
when loop closure is enabled is asserted, not assumed.
"""

import pytest

pytestmark = pytest.mark.slow
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from putslam_tpu.config import tiny_test_config
from putslam_tpu.eval import ate
from putslam_tpu.io import synthetic
from putslam_tpu.loopclosure import bow
from putslam_tpu.models import slam


def lc_cfg(enabled: bool):
    cfg = tiny_test_config()
    return cfg.replace(
        map=dataclasses.replace(cfg.map,
                                add_features_when_measurements_less_than=10,
                                max_keyframes=64),
        loop_closure=dataclasses.replace(cfg.loop_closure, enabled=enabled,
                                         tail_skip=10))


def test_loop_closure_improves_revisit_ate():
    N = 64
    poses = synthetic.revisit_trajectory(N, sweep=1.2)
    grays, depths = synthetic.render_sequence(tiny_test_config().camera, poses)
    grays, depths = np.asarray(grays), np.asarray(depths)
    gt = np.asarray(poses)

    results = {}
    for enabled in (False, True):
        cfg = lc_cfg(enabled)
        pb, pa, outs, st = slam.run_slam_final(cfg, grays, depths,
                                               init_pose=gt[0])
        results[enabled] = (ate.ate_rmse_aligned_frames(gt, pa),
                           int(st.n_lc_edges))

    a_off, edges_off = results[False]
    a_on, edges_on = results[True]
    assert edges_off == 0
    assert edges_on >= 2, edges_on
    # the point of the subsystem: closing the loop must tighten the estimate
    assert a_on < a_off, (a_on, a_off)
    assert a_on < 0.05, a_on


def test_idf_downweights_ubiquitous_words():
    """A word present in every stored signature carries ~zero idf — two
    frames sharing only that word must score near zero, while frames sharing
    a rare word keep a high score."""
    V = 8
    # corpus: word 0 in every document; words 1..3 distinctive
    sigs = jnp.asarray([
        [1.0, 1.0, 0.0, 0.0, 0, 0, 0, 0],
        [1.0, 0.0, 1.0, 0.0, 0, 0, 0, 0],
        [1.0, 0.0, 0.0, 1.0, 0, 0, 0, 0],
    ])
    sigs = sigs / jnp.linalg.norm(sigs, axis=1, keepdims=True)
    valid = jnp.array([True, True, True])

    # query sharing ONLY the ubiquitous word with doc 2
    q_common = jnp.array([1.0, 0, 0, 0, 1.0, 0, 0, 0])
    q_common = q_common / jnp.linalg.norm(q_common)
    s_common = np.asarray(bow.score_against(sigs, q_common, valid))

    # query sharing doc 2's rare word
    q_rare = jnp.array([0.0, 0, 0, 1.0, 1.0, 0, 0, 0])
    q_rare = q_rare / jnp.linalg.norm(q_rare)
    s_rare = np.asarray(bow.score_against(sigs, q_rare, valid))

    assert s_rare[2] > 0.4
    assert s_common[2] < 0.2 * s_rare[2], (s_common[2], s_rare[2])


def test_push_candidates_is_wrap_safe_and_gates_on_score():
    q = bow.init_queue(8)
    K = 4
    scores = jnp.array([0.9, 0.8, 0.05, 0.7])
    # ring wrapped: slot 0 holds keyframe 8 (recent), slot 1 holds kf 1 (old)
    kf_seq = jnp.array([8, 1, 2, 3], jnp.int32)
    n_kf = jnp.int32(9)
    q = bow.push_candidates(q, jnp.int32(0), scores, kf_seq, n_kf,
                            tail_skip=3, min_score=0.3)
    probs = np.asarray(q.prob)
    kfb = np.asarray(q.kf_b)
    kept = kfb[np.isfinite(probs)]
    # slot 0 (kf 8) is within the recency tail → excluded despite score 0.9;
    # slot 2 fails the score gate; slots 1 and 3 survive
    assert 0 not in kept
    assert 2 not in kept
    assert set(kept.tolist()) == {1, 3}


def test_pop_best_returns_highest_and_clears():
    q = bow.init_queue(4)
    kf_seq = jnp.array([0, 1, 2, 3], jnp.int32)
    q = bow.push_candidates(q, jnp.int32(3), jnp.array([0.4, 0.9, 0.0, 0.0]),
                            kf_seq, jnp.int32(20), tail_skip=2, min_score=0.3)
    a, b, p, q2 = bow.pop_best(q)
    assert float(p) == np.asarray(q.prob).max()
    assert int(b) == 1
    a2, b2, p2, _ = bow.pop_best(q2)
    assert float(p2) < float(p)
