import os

import jax.numpy as jnp
import numpy as np
import pytest

from putslam_tpu.config import CameraConfig, tiny_test_config
from putslam_tpu.geometry import se3, uncertainty
from putslam_tpu.io import synthetic, xml_config
from putslam_tpu.ops import rgbd


CAM = tiny_test_config().camera


def test_surface_normals_flat_wall():
    """A frontal wall at constant z must give normals ≈ (0,0,-1)."""
    H, W = CAM.height, CAM.width
    depth = jnp.full((H, W), 3.0)
    n = np.asarray(rgbd.surface_normals(CAM, depth))
    core = n[10:-10, 10:-10]
    # all valid and pointing back at the camera
    assert (np.abs(core[..., 2] + 1.0) < 0.05).all()


def test_surface_normals_slanted_plane():
    """Depth increasing with u → camera-facing normal tilts in +x
    (plane z = 2 + k·x has normal ∝ (k, 0, −1) on the camera side)."""
    H, W = CAM.height, CAM.width
    uu = jnp.arange(W, dtype=jnp.float32)[None, :]
    depth = jnp.broadcast_to(2.0 + 0.01 * uu, (H, W))
    n = np.asarray(rgbd.surface_normals(CAM, depth))
    core = n[20:-20, 20:-20]
    assert core[..., 0].mean() > 0.1
    assert (core[..., 2] < 0).all()
    assert (np.linalg.norm(core, axis=-1) > 0.99).all()


def test_image_gradients_directional():
    img = jnp.broadcast_to(jnp.linspace(0, 1, 64)[None, :], (48, 64))
    gx, gy = rgbd.image_gradients(img)
    assert float(gx[24, 32]) > 0.01
    assert abs(float(gy[24, 32])) < 1e-5


def test_gradient_uncertainty_integration(rng):
    g, d = synthetic.render_frame(CAM, se3.identity())
    uv = jnp.asarray(rng.uniform([20, 20], [100, 70], (32, 2)).astype(np.float32))
    z = jnp.asarray(rng.uniform(1, 3, (32,)).astype(np.float32))
    dirs = rgbd.gradient_directions_3d(CAM, g, uv, z)
    cov = uncertainty.point_covariance(CAM, uv, z)
    cov2 = uncertainty.gradient_scaled_covariance(cov, dirs, 0.8)
    assert np.isfinite(np.asarray(cov2)).all()
    # still symmetric PSD
    c2 = np.asarray(cov2)
    np.testing.assert_allclose(c2, np.swapaxes(c2, -1, -2), atol=1e-6)


def test_point_cloud_and_ply(tmp_path):
    g, d = synthetic.render_frame(CAM, se3.identity())
    P, I, ok = rgbd.colored_point_cloud(CAM, g, d, stride=4)
    assert P.shape[0] == I.shape[0] == ok.shape[0]
    path = str(tmp_path / "cloud.ply")
    rgbd.save_ply(path, P, I, ok)
    txt = open(path).read().splitlines()
    assert txt[0] == "ply"
    n_pts = int([l for l in txt if l.startswith("element vertex")][0].split()[-1])
    assert n_pts == int(np.asarray(ok).sum())


def test_reference_xml_chain():
    res = "/root/reference/resources"
    if not os.path.isdir(res):
        pytest.skip("reference not mounted")
    cfg = xml_config.load_reference_config(res, "freiburg1_desk")
    assert cfg.camera.fu == 517.3
    assert cfg.camera.width == 640
    assert cfg.camera.depth_image_scale == 5000.0
    assert cfg.ransac.inlier_threshold_euclidean == 0.04
    assert cfg.ransac.used_pairs == 3
    assert cfg.map.covisibility_keyframe == 0.9
    assert cfg.map.max_frames_window == 250
    # round-4 mappings: the MatcherOpenCV element (guided-matching sphere +
    # band ratio), uncertaintyModel dispatch, optimizationErrorType, and
    # the global thread switches
    assert cfg.matcher.matching_xyz_sphere_radius == 0.12
    assert cfg.matcher.matching_xyz_acceptance_ratio == 0.55
    assert cfg.detector.grid_rows == 1 and cfg.detector.grid_cols == 1
    assert cfg.tracker.win_size == 7 and cfg.tracker.max_levels == 3
    assert cfg.map.uncertainty_model == "gradient"   # uncertaintyModel="2"
    assert cfg.backend.error_type == 0               # optimizationErrorType
    assert cfg.only_vo is False
    assert cfg.loop_closure.enabled is False         # LC thread off
    # default chain (handles the in-tree merge-conflict markers)
    cfg2 = xml_config.load_reference_config(res)
    assert cfg2.camera.fu != cfg.camera.fu  # messor2 camera
