from putslam_tpu.eval import ate, rpe  # noqa: F401
