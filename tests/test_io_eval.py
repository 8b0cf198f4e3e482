import numpy as np
import jax.numpy as jnp
import pytest

from putslam_tpu.config import tiny_test_config
from putslam_tpu.eval import ate, rpe
from putslam_tpu.geometry import se3
from putslam_tpu.io import synthetic, tum


CFG = tiny_test_config()


def test_render_frame_shapes_and_depth_range():
    pose = se3.identity()
    gray, depth = synthetic.render_frame(CFG.camera, pose)
    assert gray.shape == (CFG.camera.height, CFG.camera.width)
    assert depth.shape == gray.shape
    g = np.asarray(gray)
    d = np.asarray(depth)
    assert 0.0 <= g.min() and g.max() <= 1.0
    assert (d > 0.1).all() and (d < 20.0).all()
    # texture must have detail (not flat)
    assert g.std() > 0.05


def test_render_photoconsistency():
    """A world point seen from two nearby poses must have identical texture."""
    cam = CFG.camera
    p0 = se3.identity()
    p1 = se3.make_pose(jnp.array([0.05, 0.0, 0.0]), se3.quat_identity())
    g0, d0 = synthetic.render_frame(cam, p0)
    g1, d1 = synthetic.render_frame(cam, p1)
    from putslam_tpu.geometry import camera as cam_mod

    # lift center pixel from frame0, project into frame1
    uv0 = jnp.array([[cam.width / 2.0, cam.height / 2.0]])
    z0 = cam_mod.sample_depth(d0, uv0)
    xyz0 = cam_mod.unproject(cam, uv0, z0)
    xyz_w = se3.apply(p0, xyz0)
    xyz1 = se3.apply(se3.inverse(p1), xyz_w)
    uv1 = cam_mod.project(cam, xyz1)
    v0 = cam_mod.bilinear_sample(g0, uv0)
    v1 = cam_mod.bilinear_sample(g1, uv1)
    # cell texture is piecewise constant; allow bilinear blending tolerance
    assert abs(float(v0[0]) - float(v1[0])) < 0.2


def test_orbit_trajectory_smooth():
    poses = synthetic.orbit_trajectory(50)
    rel = se3.relative(poses[:-1], poses[1:])
    step = np.linalg.norm(np.asarray(se3.translation(rel)), axis=-1)
    assert step.max() < 0.2  # consecutive frames overlap


def test_ate_zero_for_identical():
    poses = np.asarray(synthetic.orbit_trajectory(20))
    assert ate.ate_rmse_aligned_frames(poses, poses) < 1e-6


def test_ate_invariant_to_rigid_transform(rng):
    poses = np.asarray(synthetic.orbit_trajectory(30))
    offset = se3.make_pose(jnp.array([1.0, -2.0, 0.5]),
                           se3.so3_exp_quat(jnp.array([0.3, 0.2, -0.1])))
    moved = np.asarray(se3.compose(jnp.tile(np.asarray(offset), (30, 1)),
                                   jnp.asarray(poses)))
    assert ate.ate_rmse_aligned_frames(poses, moved) < 1e-5


def test_ate_detects_error(rng):
    poses = np.asarray(synthetic.orbit_trajectory(30)).copy()
    noisy = poses.copy()
    noisy[:, :3] += rng.normal(scale=0.05, size=(30, 3)).astype(np.float32)
    v = ate.ate_rmse_aligned_frames(poses, noisy)
    assert 0.01 < v < 0.2


def test_ate_timestamp_association():
    poses = np.asarray(synthetic.orbit_trajectory(30))
    ts = np.arange(30) * 0.033
    v = ate.ate_rmse(ts, poses, ts + 0.001, poses)
    assert v < 1e-6


def test_rpe_zero_and_nonzero(rng):
    poses = np.asarray(synthetic.orbit_trajectory(30))
    tr, rot = rpe.rpe(poses, poses, delta=1)
    assert tr < 1e-6 and rot < 1e-5
    noisy = poses.copy()
    noisy[:, :3] += rng.normal(scale=0.01, size=(30, 3)).astype(np.float32)
    tr2, _ = rpe.rpe(poses, noisy, delta=1)
    assert tr2 > 1e-3


def test_trajectory_file_roundtrip(tmp_path):
    poses = np.asarray(synthetic.orbit_trajectory(10))
    ts = np.arange(10) * 0.1 + 100.0
    path = str(tmp_path / "traj.txt")
    tum.save_trajectory(path, ts, poses)
    ts2, poses2 = tum.load_trajectory(path)
    np.testing.assert_allclose(ts, ts2, atol=1e-6)
    np.testing.assert_allclose(poses, poses2, atol=1e-5)


def test_associate():
    a = [(0.0, ["a"]), (1.0, ["b"]), (2.0, ["c"])]
    b = [(0.01, ["x"]), (1.015, ["y"]), (3.0, ["z"])]
    pairs = tum.associate(a, b, max_difference=0.02)
    assert pairs == [(0, 0), (1, 1)]


def test_tum_dataset_reader(tmp_path, rng):
    """Write a tiny synthetic TUM-format dataset and read it back."""
    from PIL import Image

    root = tmp_path
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    rgb_lines, depth_lines, gt_lines = ["# rgb"], ["# depth"], ["# gt"]
    for i in range(3):
        ts = 10.0 + i * 0.05
        rgb = (rng.uniform(0, 255, (8, 8, 3))).astype(np.uint8)
        d16 = (rng.uniform(0, 30000, (8, 8))).astype(np.uint16)
        Image.fromarray(rgb).save(root / "rgb" / f"{i}.png")
        Image.fromarray(d16).save(root / "depth" / f"{i}.png")
        rgb_lines.append(f"{ts:.6f} rgb/{i}.png")
        depth_lines.append(f"{ts + 0.004:.6f} depth/{i}.png")
        gt_lines.append(f"{ts:.6f} {i * 0.1} 0 0 0 0 0 1")
    (root / "rgb.txt").write_text("\n".join(rgb_lines))
    (root / "depth.txt").write_text("\n".join(depth_lines))
    (root / "groundtruth.txt").write_text("\n".join(gt_lines))

    ds = tum.TumDataset(str(root))
    assert len(ds) == 3
    f = ds[1]
    assert f.gray.shape == (8, 8) and f.gray.dtype == np.float32
    assert f.depth.shape == (8, 8)
    assert 0 <= f.gray.min() and f.gray.max() <= 1.0
    sp = ds.starting_pose()
    np.testing.assert_allclose(sp, [0, 0, 0, 1, 0, 0, 0], atol=1e-6)


def test_icl_conversion_roundtrip(tmp_path):
    """ICL prep (prepareDatasetICL.py + convertICLdepthToDepthImage.py
    analog): synthesize ray-distance dumps from a known z-depth map, convert
    to a TUM-format sequence, and replay it through TumDataset — the depth
    must round-trip (ray→z projection + 16-bit quantization)."""
    import numpy as np
    from PIL import Image

    from putslam_tpu.io import icl, tum

    H, W = 480, 640
    rng = np.random.default_rng(3)
    z_true = rng.uniform(0.8, 4.0, (H, W)).astype(np.float64)
    # inverse of ray_to_z: d = z · √(1 + ((u−cu)/fu)² + ((v−cv)/fv)²)
    un = (np.arange(W, dtype=np.float64)[None, :] - icl.ICL_CU) / icl.ICL_FU
    vn = (np.arange(H, dtype=np.float64)[:, None] - icl.ICL_CV) \
        / abs(icl.ICL_FV)
    dist = z_true * np.sqrt(1.0 + un * un + vn * vn)

    src = tmp_path / "povray"
    src.mkdir()
    for i in range(2):
        np.savetxt(src / f"scene_00_{i:04d}.depth", dist.ravel()[None],
                   fmt="%.5f")
        Image.fromarray((rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
                        ).save(src / f"scene_00_{i:04d}.png")
    (src / "traj0.gt.freiburg").write_text("0 0 0 -2.5 0 0 0 1\n")

    out = tmp_path / "tum"
    n = icl.prepare_icl_sequence(str(src), str(out))
    assert n == 2
    ds = tum.TumDataset(str(out))
    assert len(ds) == 2
    frame = ds[0]
    err = np.abs(frame.depth.astype(np.float64) - z_true)
    assert err.max() < 1.5e-3, err.max()  # 16-bit @5000 quantum = 0.2 mm
    assert ds.groundtruth is not None
