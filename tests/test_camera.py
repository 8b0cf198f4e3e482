import jax.numpy as jnp
import numpy as np

from putslam_tpu.config import CameraConfig
from putslam_tpu.geometry import camera, uncertainty


CAM = CameraConfig()  # fr1 intrinsics
CAM_NODIST = CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0)


def test_project_unproject_roundtrip(rng):
    uv = jnp.asarray(rng.uniform([50, 50], [590, 430], size=(256, 2)).astype(np.float32))
    d = jnp.asarray(rng.uniform(0.5, 5.0, size=(256,)).astype(np.float32))
    xyz = camera.unproject(CAM_NODIST, uv, d)
    uv2 = camera.project(CAM_NODIST, xyz)
    np.testing.assert_allclose(uv, uv2, atol=1e-3)
    np.testing.assert_allclose(xyz[:, 2], d, atol=1e-6)


def test_distortion_roundtrip(rng):
    uv = jnp.asarray(rng.uniform([100, 100], [540, 380], size=(128, 2)).astype(np.float32))
    xy = camera.pixel_to_normalized(CAM, uv)
    xy_d = camera.distort_normalized(CAM, xy)
    xy_u = camera.undistort_normalized(CAM, xy_d, iters=12)
    np.testing.assert_allclose(xy, xy_u, atol=1e-5)


def test_project_with_distortion_consistency(rng):
    """project(distort) then undistort_pixels + project-inverse recovers point."""
    xyz = jnp.asarray(
        np.stack(
            [
                rng.uniform(-0.5, 0.5, 64),
                rng.uniform(-0.4, 0.4, 64),
                rng.uniform(1.0, 4.0, 64),
            ],
            axis=-1,
        ).astype(np.float32)
    )
    uv_d = camera.project(CAM, xyz, distort=True)
    uv_ideal = camera.undistort_pixels(CAM, uv_d)
    xyz2 = camera.unproject(CAM, uv_ideal, xyz[:, 2])
    np.testing.assert_allclose(xyz, xyz2, atol=1e-3)


def test_depth_gate():
    d = jnp.array([0.05, 0.5, 5.9, 6.5])
    np.testing.assert_array_equal(
        camera.depth_valid_mask(CAM, d), jnp.array([False, True, True, False])
    )


def test_bilinear_sample_exact_on_grid():
    img = jnp.arange(12.0).reshape(3, 4)
    uv = jnp.array([[1.0, 2.0], [0.0, 0.0], [3.0, 2.0]])
    out = camera.bilinear_sample(img, uv)
    np.testing.assert_allclose(out, jnp.array([9.0, 0.0, 11.0]))
    # midpoint interpolation
    mid = camera.bilinear_sample(img, jnp.array([[0.5, 0.5]]))
    np.testing.assert_allclose(mid, jnp.array([2.5]))


def test_point_covariance_psd_and_growth(rng):
    uv = jnp.asarray(rng.uniform([0, 0], [640, 480], size=(64, 2)).astype(np.float32))
    d_near = jnp.full((64,), 0.8)
    d_far = jnp.full((64,), 4.0)
    c_near = uncertainty.point_covariance(CAM, uv, d_near)
    c_far = uncertainty.point_covariance(CAM, uv, d_far)
    # symmetric PSD
    np.testing.assert_allclose(c_near, np.swapaxes(c_near, -1, -2), atol=1e-8)
    eig_near = np.linalg.eigvalsh(np.asarray(c_near))
    assert (eig_near > -1e-10).all()
    # z-variance grows with depth
    assert (np.asarray(c_far[:, 2, 2]) > np.asarray(c_near[:, 2, 2])).all()


def test_information_matrix_is_inverse(rng):
    uv = jnp.asarray(rng.uniform([10, 10], [630, 470], size=(32, 2)).astype(np.float32))
    d = jnp.asarray(rng.uniform(0.5, 5.0, size=(32,)).astype(np.float32))
    cov = uncertainty.point_covariance(CAM, uv, d)
    info = uncertainty.information_matrix(CAM, uv, d)
    prod = np.asarray(jnp.einsum("nij,njk->nik", cov, info))
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape),
                               atol=1e-3)


def test_inv3x3_matches_numpy(rng):
    M = rng.normal(size=(32, 3, 3)).astype(np.float32)
    M = M @ np.swapaxes(M, -1, -2) + 0.5 * np.eye(3)  # well-conditioned SPD
    inv = uncertainty.inv3x3(jnp.asarray(M))
    np.testing.assert_allclose(inv, np.linalg.inv(M), rtol=1e-3, atol=1e-4)
