"""Relative Pose Error — TUM benchmark semantics.

Math of /root/reference/scripts/evaluate_rpe.py: for frame pairs a fixed delta
apart, compare the relative motion of the estimate against ground truth;
report translational RMSE (m) and rotational RMSE (rad).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from putslam_tpu.geometry import se3


def _np_pose(p):
    import jax.numpy as jnp

    return jnp.asarray(np.asarray(p, np.float32))


def rpe(gt_poses: np.ndarray, est_poses: np.ndarray, delta: int = 1
        ) -> Tuple[float, float]:
    """Frame-indexed RPE over all pairs (i, i+delta).

    gt_poses, est_poses: (N,7) [t, q_wxyz], frame-aligned.
    Returns (trans_rmse_m, rot_rmse_rad)."""
    n = min(len(gt_poses), len(est_poses))
    if n <= delta:
        raise ValueError("not enough poses for the requested delta")
    gt = _np_pose(gt_poses[:n])
    est = _np_pose(est_poses[:n])
    gt_rel = se3.relative(gt[:-delta], gt[delta:])
    est_rel = se3.relative(est[:-delta], est[delta:])
    err = se3.relative(est_rel, gt_rel)  # E = est_rel⁻¹ ∘ gt_rel
    terr = np.asarray(se3.translation(err))
    rerr = np.asarray(se3.quat_angle(se3.rotation_quat(err)))
    trans_rmse = float(np.sqrt((np.linalg.norm(terr, axis=-1) ** 2).mean()))
    rot_rmse = float(np.sqrt((rerr ** 2).mean()))
    return trans_rmse, rot_rmse
