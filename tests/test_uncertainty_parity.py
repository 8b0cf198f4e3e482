import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from putslam_tpu.backend import optimize
from putslam_tpu.config import BackendConfig, RansacConfig, tiny_test_config
from putslam_tpu.frontend import ransac as ransac_mod
from putslam_tpu.geometry import se3
from putslam_tpu.ops import kabsch

from test_backend import build_problem


def test_kabsch_uncertainty_3sigma_battery(rng):
    """demoKabsch-scale consistency battery (demos/demoKabsch.cpp:19-60:
    synthetic point sets with known SE(3) transforms across noise regimes,
    alert when an estimate falls outside the 3σ band of the propagated
    uncertainty): sweep noise levels × transforms, batch the trials with
    vmap, and require (a) ≥95 % of per-axis errors inside 3σ_pred and
    (b) the empirical per-axis std within a factor 2 of the prediction."""
    w = jnp.ones((64,))
    batch_kabsch = jax.vmap(lambda q, p: kabsch.weighted_kabsch(p, q, w),
                            in_axes=(0, None))
    for sigma in (0.002, 0.005, 0.01, 0.02):
        for t_seed in range(3):
            xi_t = rng.normal(0, 0.3, (6,)).astype(np.float32)
            T_true = se3.exp(jnp.asarray(xi_t))
            p = jnp.asarray(rng.normal(0, 1.0, (64, 3)).astype(np.float32))
            q_clean = se3.apply(T_true, p)
            trials = 200
            noise = rng.normal(0, sigma, (trials, 64, 3)).astype(np.float32)
            T_est = batch_kabsch(q_clean[None] + jnp.asarray(noise), p)
            xi = np.asarray(jax.vmap(
                lambda T: se3.boxminus(T, T_true))(T_est))   # (trials, 6)
            pred = np.asarray(kabsch.transform_covariance(
                T_true, p, w, point_var=sigma ** 2))
            sd = np.sqrt(np.clip(np.diag(pred), 1e-20, None))
            within = np.abs(xi) <= 3.0 * sd[None, :]
            frac = within.mean()
            assert frac >= 0.95, (sigma, t_seed, frac)
            ratio = xi.std(axis=0) / sd
            assert np.all(ratio > 0.4) and np.all(ratio < 2.5), \
                (sigma, t_seed, ratio)


def test_transform_covariance_scales_with_noise(rng):
    """Monte-Carlo check: the predicted 6x6 covariance should match the
    empirical scatter of Kabsch estimates under iid point noise."""
    T_true = se3.exp(jnp.asarray([0.1, -0.2, 0.05, 0.2, -0.1, 0.15],
                                 dtype=jnp.float32))
    p = jnp.asarray(rng.normal(0, 1.0, (64, 3)).astype(np.float32))
    q_clean = se3.apply(T_true, p)
    sigma = 0.01
    w = jnp.ones((64,))

    xi_samples = []
    for t in range(100):
        q = q_clean + jnp.asarray(
            rng.normal(0, sigma, (64, 3)).astype(np.float32))
        T_est = kabsch.weighted_kabsch(p, q, w)
        xi_samples.append(np.asarray(se3.boxminus(T_est, T_true)))
    emp_cov = np.cov(np.stack(xi_samples).T)

    pred_cov = np.asarray(kabsch.transform_covariance(
        T_true, p, w, point_var=sigma ** 2))
    # trace-level agreement within a factor ~2 (left-vs-right perturbation
    # and Monte-Carlo noise); same order of magnitude per diagonal entry
    ratio = np.trace(emp_cov) / np.trace(pred_cov)
    assert 0.4 < ratio < 2.5, ratio


def test_pose_covariances_shape_and_fixed_zero(rng):
    kf_true, lm_true, kf_init, lm_init, g = build_problem(rng, K=5, L=32,
                                                          obs_per_kf=24)
    K, L = kf_init.shape[0], lm_init.shape[0]
    bcfg = BackendConfig(damping=1e-5)
    fixed = jnp.zeros((K,), bool).at[0].set(True)
    cov = optimize.pose_covariances(
        bcfg, jnp.asarray(kf_true), jnp.ones((K,), bool),
        jnp.asarray(lm_true), jnp.ones((L,), bool), g, fixed)
    c = np.asarray(cov)
    assert c.shape == (K, 6, 6)
    np.testing.assert_allclose(c[0], 0.0)
    # non-fixed poses: SPD blocks with sane scale (information ~ noise²/n)
    for k in range(1, K):
        eig = np.linalg.eigvalsh(0.5 * (c[k] + c[k].T))
        assert eig.min() > 0, (k, eig)
        assert eig.max() < 1.0


def test_ransac_mahalanobis_model(rng):
    cfg_r = RansacConfig(error_version=3, n_hypotheses=256,
                         inlier_threshold_mahalanobis=16.0)
    T_true = se3.exp(jnp.asarray([0.05, -0.03, 0.02, 0.1, -0.05, 0.08],
                                 dtype=jnp.float32))
    p = jnp.asarray(rng.normal(0, 1, (256, 3)).astype(np.float32)
                    + np.array([0, 0, 3], np.float32))
    sigma = 0.005
    q = se3.apply(T_true, p) + jnp.asarray(
        rng.normal(0, sigma, (256, 3)).astype(np.float32))
    q = q.at[:80].add(jnp.asarray(rng.uniform(0.3, 1.0, (80, 3)).astype(np.float32)))
    info = jnp.tile(jnp.eye(3) / sigma ** 2, (256, 1, 1))
    res = ransac_mod.estimate(cfg_r, None, jax.random.PRNGKey(0), p, q,
                              jnp.ones((256,), bool), info=info)
    assert bool(res.ok)
    err = np.asarray(se3.boxminus(res.pose, T_true))
    assert np.abs(err).max() < 0.01
    assert np.asarray(res.inliers)[:80].mean() < 0.05


def test_ransac_quality_sampling_improves_hard_case(rng):
    """With 85% outliers and few hypotheses, quality-biased sampling should
    find the model at least as reliably as uniform."""
    T_true = se3.exp(jnp.asarray([0.05, 0.02, -0.04, 0.05, 0.1, -0.03],
                                 dtype=jnp.float32))
    N = 512
    p = jnp.asarray(rng.normal(0, 1, (N, 3)).astype(np.float32))
    q = se3.apply(T_true, p)
    n_out = int(N * 0.85)
    q = q.at[:n_out].add(jnp.asarray(rng.uniform(0.3, 2.0, (n_out, 3))
                                     .astype(np.float32)))
    # quality: outliers have high (bad) distances most of the time
    quality = jnp.concatenate([
        jnp.asarray(rng.uniform(40, 70, n_out).astype(np.float32)),
        jnp.asarray(rng.uniform(5, 25, N - n_out).astype(np.float32))])
    valid = jnp.ones((N,), bool)

    def success(cfg_r, seed):
        res = ransac_mod.estimate(cfg_r, None, jax.random.PRNGKey(seed), p, q,
                                  valid, quality=quality)
        err = np.abs(np.asarray(se3.boxminus(res.pose, T_true))).max()
        return bool(res.ok) and err < 0.02

    base = RansacConfig(n_hypotheses=48, minimal_inlier_ratio=0.1)
    qcfg = dataclasses.replace(base, quality_tau=10.0)
    wins_u = sum(success(base, s) for s in range(10))
    wins_q = sum(success(qcfg, s) for s in range(10))
    assert wins_q >= wins_u, (wins_u, wins_q)
    assert wins_q >= 7, wins_q
