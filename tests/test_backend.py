import pytest
import jax
import jax.numpy as jnp
import numpy as np

from putslam_tpu.backend import factors, graph, optimize
from putslam_tpu.config import BackendConfig
from putslam_tpu.geometry import se3


def build_problem(rng, K=6, L=64, obs_per_kf=48, noise=0.005,
                  pose_noise=0.05, cap=1024, ppcap=64):
    # observation weights are scalar information 1/sigma^2 (reference uses
    # information matrices from the sensor model; chi^2 is then normalized
    # so Cauchy delta=1 and chi^2 prune thresholds behave like g2o's)
    """Ground-truth world: landmarks in a box, keyframes on an arc, every
    keyframe observes a random subset of landmarks in its camera frame."""
    lm_true = np.stack([
        rng.uniform(-2, 2, L), rng.uniform(-1.5, 1.5, L), rng.uniform(2, 5, L)
    ], -1).astype(np.float32)
    s = np.linspace(0, 0.8, K)
    kf_true = np.stack([
        np.stack([0.5 * np.sin(t), 0.1 * t, 0.3 * t], -1) for t in s
    ]).astype(np.float32).reshape(K, 3)
    quats = np.stack([
        np.asarray(se3.so3_exp_quat(jnp.asarray([0.05 * t, 0.2 * t, 0.02 * t],
                                                dtype=jnp.float32)))
        for t in s
    ])
    kf_true = np.concatenate([kf_true, quats], -1).astype(np.float32)

    g = graph.init_graph(cap, ppcap)
    for k in range(K):
        idx = rng.choice(L, obs_per_kf, replace=False)
        z = np.asarray(se3.apply(se3.inverse(jnp.asarray(kf_true[k])),
                                 jnp.asarray(lm_true[idx])))
        z = z + rng.normal(0, noise, z.shape).astype(np.float32)
        info = 1.0 / max(noise, 1e-3) ** 2
        g = graph.add_observations(
            g, jnp.full((obs_per_kf,), k, jnp.int32), jnp.asarray(idx, jnp.int32),
            jnp.asarray(z), jnp.full((obs_per_kf,), info), jnp.ones((obs_per_kf,), bool))

    # initial guesses: perturbed
    kf_init = np.array(se3.retract(
        jnp.asarray(kf_true),
        jnp.asarray(rng.normal(0, pose_noise, (K, 6)).astype(np.float32))
    ))
    kf_init[0] = kf_true[0]  # gauge
    lm_init = lm_true + rng.normal(0, 0.05, lm_true.shape).astype(np.float32)
    return kf_true, lm_true, kf_init, lm_init, g


def run_ba(kf_init, lm_init, g, iters=6, kind="none"):
    K, L = kf_init.shape[0], lm_init.shape[0]
    bcfg = BackendConfig(gn_iterations=iters, robust_kernel=kind, damping=1e-5)
    fixed = jnp.zeros((K,), bool).at[0].set(True)
    return optimize.gauss_newton(
        bcfg, jnp.asarray(kf_init), jnp.ones((K,), bool),
        jnp.asarray(lm_init), jnp.ones((L,), bool), g, fixed)


def test_ba_converges_to_ground_truth(rng):
    kf_true, lm_true, kf_init, lm_init, g = build_problem(rng, noise=0.0)
    res = run_ba(kf_init, lm_init, g)
    # chi2 strictly decreasing to ~0
    chi = np.asarray(res.chi2)
    assert chi[-1] < 1e-6 * chi[0] + 1e-10, chi
    err_t = np.abs(np.asarray(res.kf_pose)[:, :3] - kf_true[:, :3])
    assert err_t.max() < 1e-3, err_t.max()
    err_l = np.abs(np.asarray(res.lm_pos) - lm_true)
    assert err_l.max() < 1e-3, err_l.max()


def test_ba_noisy_observations_reduce_error(rng):
    kf_true, lm_true, kf_init, lm_init, g = build_problem(rng, noise=0.005)
    init_err = np.linalg.norm(kf_init[:, :3] - kf_true[:, :3], axis=-1).mean()
    res = run_ba(kf_init, lm_init, g)
    final_err = np.linalg.norm(
        np.asarray(res.kf_pose)[:, :3] - kf_true[:, :3], axis=-1).mean()
    assert final_err < 0.3 * init_err, (init_err, final_err)


def test_ba_gauge_fixed_pose_unmoved(rng):
    kf_true, lm_true, kf_init, lm_init, g = build_problem(rng)
    res = run_ba(kf_init, lm_init, g)
    np.testing.assert_allclose(np.asarray(res.kf_pose)[0], kf_init[0], atol=1e-7)


def test_ba_robust_kernel_downweights_outliers(rng):
    kf_true, lm_true, kf_init, lm_init, g = build_problem(rng, noise=0.002)
    # corrupt 10% of observations grossly
    M = g.obs_capacity
    n_valid = int(np.asarray(g.n_obs))
    bad = np.zeros(M, bool)
    bad_idx = rng.choice(n_valid, n_valid // 10, replace=False)
    bad[bad_idx] = True
    obs_xyz = np.array(g.obs_xyz)
    obs_xyz[bad] += rng.uniform(0.5, 1.0, (bad.sum(), 3)).astype(np.float32)
    g_bad = g._replace(obs_xyz=jnp.asarray(obs_xyz))

    res_plain = run_ba(kf_init, lm_init, g_bad, kind="none")
    res_cauchy = run_ba(kf_init, lm_init, g_bad, iters=10, kind="cauchy")
    err_plain = np.linalg.norm(
        np.asarray(res_plain.kf_pose)[:, :3] - kf_true[:, :3], axis=-1).mean()
    err_cauchy = np.linalg.norm(
        np.asarray(res_cauchy.kf_pose)[:, :3] - kf_true[:, :3], axis=-1).mean()
    assert err_cauchy < err_plain, (err_plain, err_cauchy)
    # outlier edges should carry large final errors → prunable
    # chi2 threshold: inliers ~ 3 (3 dof), outliers ~ (0.5/0.002)^2 >> 25
    prune = optimize.prune_mask_from_errors(BackendConfig(), res_cauchy.obs_sq_err, 25.0)
    pm = np.asarray(prune)
    assert pm[bad].mean() > 0.9
    assert pm[~bad & np.asarray(g.obs_valid)].mean() < 0.1


def test_ba_pose_pose_only_chain(rng):
    """Odometry chain + loop edge: pure pose-graph optimization distributes
    the loop-closure correction (no landmarks)."""
    K = 8
    g = graph.init_graph(16, 32)
    kf_true = []
    p = se3.identity()
    kf_true.append(np.asarray(p))
    for k in range(1, K):
        xi = jnp.asarray([0.2, 0.0, 0.05, 0.0, 0.25, 0.0], dtype=jnp.float32)
        p = se3.retract(jnp.asarray(kf_true[-1]), xi)
        kf_true.append(np.asarray(p))
    kf_true = np.stack(kf_true)
    # odometry edges with noise, loop edge exact
    drift = rng.normal(0, 0.02, (K - 1, 6)).astype(np.float32)
    kf_init = [kf_true[0]]
    for k in range(1, K):
        rel = se3.relative(jnp.asarray(kf_true[k - 1]), jnp.asarray(kf_true[k]))
        rel_noisy = se3.compose(rel, se3.exp(jnp.asarray(drift[k - 1])))
        g = graph.add_pose_pose(g, k - 1, k, rel_noisy, 1.0)
        kf_init.append(np.asarray(se3.compose(jnp.asarray(kf_init[-1]), rel_noisy)))
    kf_init = np.stack(kf_init)
    # exact loop edge 0→K-1 with high weight
    rel_loop = se3.relative(jnp.asarray(kf_true[0]), jnp.asarray(kf_true[-1]))
    g = graph.add_pose_pose(g, 0, K - 1, rel_loop, 100.0)

    bcfg = BackendConfig(gn_iterations=10, robust_kernel="none", damping=1e-6)
    fixed = jnp.zeros((K,), bool).at[0].set(True)
    res = optimize.gauss_newton(
        bcfg, jnp.asarray(kf_init), jnp.ones((K,), bool),
        jnp.zeros((4, 3)), jnp.zeros((4,), bool), g, fixed)
    err_init = np.linalg.norm(kf_init[-1, :3] - kf_true[-1, :3])
    err_final = np.linalg.norm(np.asarray(res.kf_pose)[-1, :3] - kf_true[-1, :3])
    assert err_final < 0.2 * err_init + 1e-4, (err_init, err_final)


def test_graph_append_and_capacity():
    g = graph.init_graph(8, 4)
    mask = jnp.array([True, False, True])
    g = graph.add_observations(
        g, jnp.array([0, 1, 2], jnp.int32), jnp.array([5, 6, 7], jnp.int32),
        jnp.ones((3, 3)), jnp.ones((3,)), mask)
    assert int(g.n_obs) == 2
    assert np.asarray(g.obs_valid)[:2].all()
    assert np.asarray(g.obs_lm)[:2].tolist() == [5, 7]
    g = graph.add_pose_pose(g, 0, 1, se3.identity(), 2.0)
    assert int(g.n_pp) == 1 and bool(g.pp_valid[0])
    g = graph.add_pose_pose(g, 1, 2, se3.identity(), 2.0, valid=False)
    assert int(g.n_pp) == 1


def test_factor_jacobians_match_autodiff(rng):
    kf = jnp.asarray(np.concatenate([
        rng.normal(0, 1, (4, 3)),
        np.asarray(se3.quat_normalize(jnp.asarray(
            rng.normal(0, 1, (4, 4)).astype(np.float32))))], -1).astype(np.float32))
    lm = jnp.asarray(rng.normal(0, 2, (4, 3)).astype(np.float32))
    z = jnp.asarray(rng.normal(0, 2, (4, 3)).astype(np.float32))
    Jp, Jl = factors.obs_jacobians(kf, lm)

    def r_pose(xi, k, l):
        return factors.obs_residual(se3.retract(k, xi), l, jnp.zeros(3))

    for i in range(4):
        Jp_ad = jax.jacfwd(lambda xi: r_pose(xi, kf[i], lm[i]))(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(Jp[i]), np.asarray(Jp_ad),
                                   atol=1e-4)
        Jl_ad = jax.jacfwd(lambda l: factors.obs_residual(kf[i], l, z[i]))(lm[i])
        np.testing.assert_allclose(np.asarray(Jl[i]), np.asarray(Jl_ad),
                                   atol=1e-4)


@pytest.mark.slow
def test_pcg_solver_matches_dense(rng):
    kf_true, lm_true, kf_init, lm_init, g = build_problem(rng, noise=0.003)
    K, L = kf_init.shape[0], lm_init.shape[0]
    fixed = jnp.zeros((K,), bool).at[0].set(True)
    dense = BackendConfig(gn_iterations=4, robust_kernel="cauchy",
                          damping=1e-5, solver="dense_schur")
    # PCG needs a couple more outer iterations to match the exact dense solve
    pcg = BackendConfig(gn_iterations=7, robust_kernel="cauchy",
                        damping=1e-5, solver="pcg", pcg_iterations=64)
    r1 = optimize.optimize_graph(dense, jnp.asarray(kf_init),
                                 jnp.ones((K,), bool), jnp.asarray(lm_init),
                                 jnp.ones((L,), bool), g, fixed)
    r2 = optimize.optimize_graph(pcg, jnp.asarray(kf_init),
                                 jnp.ones((K,), bool), jnp.asarray(lm_init),
                                 jnp.ones((L,), bool), g, fixed)
    # both reduce chi2 by orders of magnitude and land on the same solution
    c1, c2 = np.asarray(r1.chi2), np.asarray(r2.chi2)
    assert c2[-1] < 1e-3 * c2[0], c2
    assert c2[-1] < 2.0 * c1[-1] + 1e-6, (c1, c2)
    np.testing.assert_allclose(np.asarray(r1.kf_pose)[:, :3],
                               np.asarray(r2.kf_pose)[:, :3], atol=5e-3)
