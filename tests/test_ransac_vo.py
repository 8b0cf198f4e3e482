import jax
import jax.numpy as jnp
import numpy as np

from putslam_tpu.config import tiny_test_config, RansacConfig
from putslam_tpu.eval import ate
from putslam_tpu.frontend import ransac as ransac_mod
from putslam_tpu.geometry import se3
from putslam_tpu.io import synthetic
from putslam_tpu.models import vo


CFG = tiny_test_config()


def make_correspondences(rng, n=256, outlier_frac=0.4, noise=0.003):
    T_true = se3.exp(jnp.asarray([0.05, -0.03, 0.02, 0.1, -0.05, 0.08],
                                 dtype=jnp.float32))
    p = jnp.asarray(np.stack([
        rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), rng.uniform(1, 4, n)
    ], -1).astype(np.float32))
    q = se3.apply(T_true, p)
    q = q + jnp.asarray(rng.normal(0, noise, (n, 3)).astype(np.float32))
    n_out = int(n * outlier_frac)
    q = q.at[:n_out].add(jnp.asarray(rng.uniform(0.3, 2.0, (n_out, 3)).astype(np.float32)))
    valid = jnp.ones((n,), bool)
    return T_true, p, q, valid, n_out


def test_ransac_recovers_pose_with_outliers(rng):
    T_true, p, q, valid, n_out = make_correspondences(rng)
    res = ransac_mod.estimate(CFG.ransac, CFG.camera, jax.random.PRNGKey(0),
                              p, q, valid)
    assert bool(res.ok)
    err = np.asarray(se3.boxminus(res.pose, T_true))
    assert np.abs(err).max() < 0.01, err
    # outliers rejected
    inl = np.asarray(res.inliers)
    assert inl[:n_out].mean() < 0.05
    assert inl[n_out:].mean() > 0.9


def test_ransac_identity_fallback_on_garbage(rng):
    p = jnp.asarray(rng.uniform(-1, 1, (128, 3)).astype(np.float32))
    q = jnp.asarray(rng.uniform(-1, 1, (128, 3)).astype(np.float32))
    res = ransac_mod.estimate(CFG.ransac, CFG.camera, jax.random.PRNGKey(1),
                              p, q, jnp.ones((128,), bool))
    assert not bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.pose), np.asarray(se3.identity()),
                               atol=1e-6)


def test_ransac_too_few_matches(rng):
    p = jnp.asarray(rng.normal(0, 1, (64, 3)).astype(np.float32))
    q = p + 0.01
    valid = jnp.zeros((64,), bool).at[:5].set(True)  # < minimal_num_matches
    res = ransac_mod.estimate(CFG.ransac, CFG.camera, jax.random.PRNGKey(2),
                              p, q, valid)
    assert not bool(res.ok)


def test_ransac_reprojection_error_model(rng):
    cfg_r = RansacConfig(error_version=1, n_hypotheses=256)
    T_true, p, q, valid, n_out = make_correspondences(rng, outlier_frac=0.3)
    res = ransac_mod.estimate(cfg_r, CFG.camera, jax.random.PRNGKey(3),
                              p, q, valid)
    assert bool(res.ok)
    err = np.asarray(se3.boxminus(res.pose, T_true))
    assert np.abs(err).max() < 0.02, err


def test_vo_step_recovers_motion_between_rendered_frames():
    cfg = CFG
    p0 = se3.identity()
    xi = jnp.asarray([0.03, -0.01, 0.02, 0.02, 0.03, -0.01], dtype=jnp.float32)
    p1 = se3.retract(p0, xi)
    from putslam_tpu.frontend.detector import detect_and_describe

    g0, d0 = synthetic.render_frame(cfg.camera, p0)
    g1, d1 = synthetic.render_frame(cfg.camera, p1)
    f0 = detect_and_describe(cfg, g0, d0)
    f1 = detect_and_describe(cfg, g1, d1)
    assert int(np.asarray(f0.valid).sum()) > 30
    res = vo.vo_step(cfg, jax.random.PRNGKey(0), f0, f1)
    assert bool(res.ok), (int(res.n_matches), int(res.n_inliers))
    # rel_pose should equal the true relative pose p0⁻¹∘p1 = exp(xi)
    T_true = se3.exp(xi)
    err = np.asarray(se3.boxminus(res.rel_pose, T_true))
    assert np.abs(err[:3]).max() < 0.02, err   # translation ~cm accuracy
    assert np.abs(err[3:]).max() < 0.03, err


def test_vo_sequence_ate_on_synthetic_orbit():
    cfg = CFG
    poses_gt = synthetic.orbit_trajectory(40, radius=0.15, yaw_amp=0.15)
    grays, depths = synthetic.render_sequence(cfg.camera, poses_gt)
    est, stats = vo.run_vo(cfg, grays, depths, init_pose=np.asarray(poses_gt[0]))
    # the 128×96 test camera is extremely low-res (1 px ≈ 37 mm at 3 m);
    # some grazing-wall frames legitimately fall back to identity
    ok_frac = stats.ok.mean()
    assert ok_frac > 0.5, ok_frac
    rmse = ate.ate_rmse_aligned_frames(np.asarray(poses_gt), est)
    assert rmse < 0.15, rmse
