import jax
import jax.numpy as jnp
import numpy as np
import pytest

from putslam_tpu.geometry import se3


def random_quats(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def random_poses(rng, n):
    t = rng.normal(size=(n, 3)).astype(np.float32)
    return np.concatenate([t, random_quats(rng, n)], axis=-1)


def test_quat_rotate_matches_matrix(rng):
    q = jnp.asarray(random_quats(rng, 64))
    v = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    R = se3.quat_to_matrix(q)
    np.testing.assert_allclose(
        se3.quat_rotate(q, v), jnp.einsum("nij,nj->ni", R, v), atol=1e-5
    )


def test_matrix_quat_roundtrip(rng):
    q = jnp.asarray(random_quats(rng, 128))
    q = jnp.where(q[..., 0:1] < 0, -q, q)
    q2 = se3.matrix_to_quat(se3.quat_to_matrix(q))
    np.testing.assert_allclose(q, q2, atol=1e-5)


def test_compose_inverse(rng):
    a = jnp.asarray(random_poses(rng, 32))
    b = jnp.asarray(random_poses(rng, 32))
    ab = se3.compose(a, b)
    # matrix check
    np.testing.assert_allclose(
        se3.to_matrix(ab), se3.to_matrix(a) @ se3.to_matrix(b), atol=1e-5
    )
    ident = se3.compose(a, se3.inverse(a))
    np.testing.assert_allclose(se3.translation(ident), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(se3.rotation_quat(ident)[..., 0]), 1.0, atol=1e-5)


def test_apply_matches_matrix(rng):
    p = jnp.asarray(random_poses(rng, 16))
    pts = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    M = se3.to_matrix(p)
    expected = jnp.einsum("nij,nj->ni", M[:, :3, :3], pts) + M[:, :3, 3]
    np.testing.assert_allclose(se3.apply(p, pts), expected, atol=1e-5)


def test_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.normal(size=(64, 6)).astype(np.float32)) * 0.5
    p = se3.exp(xi)
    xi2 = se3.log(p)
    np.testing.assert_allclose(xi, xi2, atol=1e-4)


def test_exp_log_small_angle():
    xi = jnp.asarray([[1e-6, -2e-6, 3e-7, 1e-7, -1e-7, 2e-7]], dtype=jnp.float32)
    p = se3.exp(xi)
    np.testing.assert_allclose(se3.log(p), xi, atol=1e-8)
    # zero twist → identity pose
    np.testing.assert_allclose(
        se3.exp(jnp.zeros((1, 6))), se3.identity((1,)), atol=1e-7
    )


def test_retract_boxminus(rng):
    p = jnp.asarray(random_poses(rng, 8))
    xi = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32)) * 0.3
    q = se3.retract(p, xi)
    np.testing.assert_allclose(se3.boxminus(q, p), xi, atol=1e-4)


def test_jit_and_vmap():
    p = se3.identity((4,))
    f = jax.jit(lambda a, b: se3.compose(a, b))
    out = f(p, p)
    assert out.shape == (4, 7)
    vm = jax.vmap(se3.exp)(jnp.zeros((5, 6)))
    assert vm.shape == (5, 7)


def test_from_matrix_roundtrip(rng):
    p = jnp.asarray(random_poses(rng, 16))
    p = p.at[:, 3:].set(jnp.where(p[:, 3:4] < 0, -p[:, 3:], p[:, 3:]))
    p2 = se3.from_matrix(se3.to_matrix(p))
    np.testing.assert_allclose(p, p2, atol=1e-5)
