import jax.numpy as jnp
import numpy as np

from putslam_tpu.config import MotionModelConfig
from putslam_tpu.geometry import se3
from putslam_tpu.io import synthetic
from putslam_tpu.motion import ekf


CFG = MotionModelConfig(decay=0.98)


def test_static_stays():
    s = ekf.init(CFG)
    for _ in range(10):
        s = ekf.predict(CFG, s, 1 / 30)
        s = ekf.correct(CFG, s, se3.identity())
    p = ekf.predicted_pose(s)
    np.testing.assert_allclose(np.asarray(se3.translation(p)), 0, atol=1e-4)


def test_constant_velocity_prediction():
    """Feed constant-velocity poses; prediction must anticipate the motion."""
    s = ekf.init(CFG)
    dt = 1 / 30
    v = np.array([0.3, -0.1, 0.2], np.float32)  # m/s
    for i in range(1, 30):
        s = ekf.predict(CFG, s, dt)
        pose = se3.make_pose(jnp.asarray(v * i * dt), se3.quat_identity())
        s = ekf.correct(CFG, s, pose)
    # one more predict — should land close to the next true position
    s = ekf.predict(CFG, s, dt)
    pred = np.asarray(se3.translation(ekf.predicted_pose(s)))
    truth = v * 30 * dt
    np.testing.assert_allclose(pred, truth, atol=0.01)
    # the *decaying* velocity model intentionally underestimates speed;
    # require the right direction and >60% magnitude
    vel = np.asarray(s.x[3:6])
    assert np.dot(vel, v) / (np.linalg.norm(vel) * np.linalg.norm(v)) > 0.99
    assert np.linalg.norm(vel) > 0.6 * np.linalg.norm(v)


def test_rotation_tracking():
    s = ekf.init(CFG)
    dt = 1 / 30
    w = np.array([0.0, 0.5, 0.0], np.float32)  # rad/s yaw
    for i in range(1, 40):
        q = se3.so3_exp_quat(jnp.asarray(w * i * dt))
        s = ekf.predict(CFG, s, dt)
        s = ekf.correct(CFG, s, se3.make_pose(jnp.zeros(3), q))
    s = ekf.predict(CFG, s, dt)
    q_pred = se3.rotation_quat(ekf.predicted_pose(s))
    q_true = se3.so3_exp_quat(jnp.asarray(w * 40 * dt))
    dq = se3.quat_mul(se3.quat_conj(q_pred), q_true)
    assert abs(float(dq[0])) > 0.9999  # < 1.7 deg one-step prediction error
    # decaying model + linear quat measurement → angvel magnitude biased low
    west = np.asarray(s.x[10:13])
    assert west[1] > 0.4 * w[1]
    assert abs(west[0]) < 0.05 and abs(west[2]) < 0.05


def test_covariance_stays_bounded_and_spd():
    s = ekf.init(CFG)
    for _ in range(100):
        s = ekf.predict(CFG, s, 1 / 30)
        s = ekf.correct(CFG, s, se3.identity())
    P = np.asarray(s.P)
    assert np.isfinite(P).all()
    eig = np.linalg.eigvalsh(0.5 * (P + P.T))
    assert eig.min() > -1e-6
    assert eig.max() < 10.0
