import pytest

pytestmark = pytest.mark.slow
import dataclasses

import jax.numpy as jnp
import numpy as np

from putslam_tpu.config import tiny_test_config
from putslam_tpu.eval import ate
from putslam_tpu.io import synthetic
from putslam_tpu.models import slam, vo
from putslam_tpu.slam_map import features_map as fm
from putslam_tpu.geometry import se3


def small_slam_cfg():
    cfg = tiny_test_config()
    return cfg.replace(map=dataclasses.replace(
        cfg.map, add_features_when_measurements_less_than=10))


def test_slam_init_provisions_landmarks():
    cfg = small_slam_cfg()
    g, d = synthetic.render_frame(cfg.camera, se3.identity())
    st = slam.slam_init(cfg, g, d)
    n_lm = int(np.asarray(st.map.lm_valid).sum())
    assert n_lm > 20
    assert int(st.map.n_kf) == 1
    assert bool(st.map.kf_valid[0])
    # initial observations anchored to kf 0
    assert int(st.graph.n_obs) == n_lm


def test_guided_match_finds_map_landmarks():
    cfg = small_slam_cfg()
    g0, d0 = synthetic.render_frame(cfg.camera, se3.identity())
    st = slam.slam_init(cfg, g0, d0)
    from putslam_tpu.frontend.detector import detect_and_describe

    feat = detect_and_describe(cfg, g0, d0)
    gm = fm.guided_match(cfg, st.map, se3.identity(), feat)
    n_lm = int(np.asarray(st.map.lm_valid).sum())
    n_matched = int(np.asarray(gm.valid).sum())
    # same frame → almost every landmark re-matches at distance ~0
    assert n_matched > 0.9 * n_lm, (n_matched, n_lm)
    md = np.asarray(gm.dist)[np.asarray(gm.valid)]
    assert np.median(md) < 5.0


def test_slam_beats_vo_on_orbit():
    cfg = small_slam_cfg()
    poses_gt = synthetic.orbit_trajectory(30, radius=0.15, yaw_amp=0.15)
    grays, depths = synthetic.render_sequence(cfg.camera, poses_gt)
    gt = np.asarray(poses_gt)
    est_slam, outs, _ = slam.run_slam(cfg, np.asarray(grays), np.asarray(depths),
                                      init_pose=gt[0])
    est_vo, _ = vo.run_vo(cfg, grays, depths, init_pose=gt[0])
    a_slam = ate.ate_rmse_aligned_frames(gt, est_slam)
    a_vo = ate.ate_rmse_aligned_frames(gt, est_vo)
    assert outs.ba_ran.sum() >= 2
    assert a_slam < 0.04, a_slam
    # the map + BA must strictly beat raw VO (golden values are pinned in
    # tests/golden_ate.json: slam ≈ 0.016 vs vo ≈ 0.049 on this orbit)
    assert a_slam < a_vo, (a_slam, a_vo)


def test_slam_static_camera_stays_put():
    cfg = small_slam_cfg()
    g, d = synthetic.render_frame(cfg.camera, se3.identity())
    grays = np.tile(np.asarray(g)[None], (8, 1, 1))
    depths = np.tile(np.asarray(d)[None], (8, 1, 1))
    est, outs, _ = slam.run_slam(cfg, grays, depths)
    drift = np.linalg.norm(est[:, :3], axis=-1)
    assert drift.max() < 0.02, drift.max()


def test_map_landmark_lifecycle():
    cfg = small_slam_cfg()
    m = fm.init_map(cfg)
    # add some landmarks manually through add_landmarks
    from putslam_tpu.frontend.detector import detect_and_describe

    g0, d0 = synthetic.render_frame(cfg.camera, se3.identity())
    feat = detect_and_describe(cfg, g0, d0)
    m, kf_idx = fm.add_keyframe(cfg, m, se3.identity(), jnp.float32(1.0))
    m = fm.add_landmarks(cfg, m, se3.identity(), feat,
                         jnp.zeros((feat.capacity,), bool), kf_idx)
    n0 = int(np.asarray(m.lm_valid).sum())
    assert n0 > 0
    # re-adding the same features must not duplicate (proximity gate)
    m2 = fm.add_landmarks(cfg, m, se3.identity(), feat,
                          jnp.zeros((feat.capacity,), bool), kf_idx)
    assert int(np.asarray(m2.lm_valid).sum()) == n0


def test_keyframe_ring_and_covisibility():
    cfg = small_slam_cfg()
    m = fm.init_map(cfg)
    m, i0 = fm.add_keyframe(cfg, m, se3.identity(), jnp.float32(1.0))
    p1 = se3.make_pose(jnp.array([0.1, 0, 0]), se3.quat_identity())
    m, i1 = fm.add_keyframe(cfg, m, p1, jnp.float32(0.7))
    assert int(m.n_kf) == 2
    assert abs(float(m.covis[int(i1), int(i0)]) - 0.7) < 1e-6
    np.testing.assert_allclose(np.asarray(m.kf_pose[int(i1)]), np.asarray(p1))
