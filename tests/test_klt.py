import pytest

pytestmark = pytest.mark.slow
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from putslam_tpu.config import TrackerConfig, tiny_test_config
from putslam_tpu.eval import ate
from putslam_tpu.geometry import se3
from putslam_tpu.io import synthetic
from putslam_tpu.models import vo
from putslam_tpu.ops import klt


def test_pyramid_shapes():
    img = jnp.zeros((96, 128))
    pyr = klt.build_pyramid(img, 3)
    assert pyr[0].shape == (96, 128)
    assert pyr[1].shape == (48, 64)
    assert pyr[2].shape == (24, 32)


def test_track_pure_translation(rng):
    """Shift a textured image by a known offset; KLT must recover it."""
    cfg = tiny_test_config()
    g0, _ = synthetic.render_frame(cfg.camera, se3.identity())
    g0 = np.asarray(g0)
    dx, dy = 3.0, -2.0
    # integer-shift image (wraps at border; track interior points only)
    g1 = np.roll(np.roll(g0, int(dy), axis=0), int(dx), axis=1)
    pts = np.stack(np.meshgrid(np.linspace(30, 98, 8), np.linspace(25, 70, 6)),
                   -1).reshape(-1, 2).astype(np.float32)
    tcfg = TrackerConfig(win_size=7, max_levels=3, max_iter=30)
    res = klt.track(tcfg, jnp.asarray(g0), jnp.asarray(g1), jnp.asarray(pts),
                    jnp.ones((pts.shape[0],), bool))
    flow = np.asarray(res.pts) - pts
    v = np.asarray(res.valid)
    assert v.mean() > 0.7, v.mean()
    np.testing.assert_allclose(flow[v].mean(0), [dx, dy], atol=0.2)
    assert np.abs(flow[v] - [dx, dy]).max() < 0.6


def test_track_error_gate_on_mismatch(rng):
    cfg = tiny_test_config()
    g0, _ = synthetic.render_frame(cfg.camera, se3.identity())
    g1 = jnp.asarray(rng.uniform(0, 1, g0.shape).astype(np.float32))
    pts = jnp.asarray([[50.0, 50.0], [80.0, 40.0]])
    tcfg = TrackerConfig()
    res = klt.track(tcfg, g0, g1, pts, jnp.ones((2,), bool))
    assert not bool(res.valid.any())


def test_refine_patch_alignment(rng):
    cfg = tiny_test_config()
    g0, _ = synthetic.render_frame(cfg.camera, se3.identity())
    g0 = np.asarray(g0)
    g1 = np.roll(g0, 2, axis=1)  # true offset (2, 0)
    pts = np.array([[40.0, 40.0], [70.0, 55.0], [90.0, 30.0]], np.float32)
    # bad initial guesses a couple of pixels off the truth
    init = pts + np.array([[2.8, 0.9], [1.2, -0.7], [2.1, 0.4]], np.float32)
    res = klt.refine_patch_alignment(
        TrackerConfig(max_iter=30), jnp.asarray(g0), jnp.asarray(g1),
        jnp.asarray(pts), jnp.asarray(init), jnp.ones((3,), bool))
    flow = np.asarray(res.pts) - pts
    np.testing.assert_allclose(flow, np.tile([[2.0, 0.0]], (3, 1)), atol=0.3)


def test_tracking_vo_on_orbit():
    cfg = tiny_test_config().replace(vo_version=1)
    cfg = cfg.replace(tracker=dataclasses.replace(cfg.tracker,
                                                  min_tracked_features=60))
    poses_gt = synthetic.orbit_trajectory(30, radius=0.12, yaw_amp=0.1)
    grays, depths = synthetic.render_sequence(cfg.camera, poses_gt)
    est, stats = vo.run_vo(cfg, grays, depths, init_pose=np.asarray(poses_gt[0]))
    rmse = ate.ate_rmse_aligned_frames(np.asarray(poses_gt), est)
    assert stats.ok.mean() > 0.5, stats.ok.mean()
    assert rmse < 0.15, rmse


def test_tracking_vo_with_patch_refine():
    """MatchingOnPatches wired into the tracking pipeline: the widened-window
    photometric polish must not degrade tracking VO (and typically helps)."""
    base = tiny_test_config().replace(vo_version=1)
    poses_gt = synthetic.orbit_trajectory(20, radius=0.12, yaw_amp=0.1)
    grays, depths = synthetic.render_sequence(base.camera, poses_gt)
    gt = np.asarray(poses_gt)
    results = {}
    for refine in (False, True):
        cfg = base.replace(tracker=dataclasses.replace(
            base.tracker, min_tracked_features=60, patch_refine=refine))
        est, stats = vo.run_vo(cfg, grays, depths, init_pose=gt[0])
        results[refine] = ate.ate_rmse_aligned_frames(gt, est)
    assert results[True] < 0.15, results
    assert results[True] < results[False] * 1.3, results
