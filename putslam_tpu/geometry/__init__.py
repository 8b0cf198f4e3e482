from putslam_tpu.geometry import se3, camera, uncertainty  # noqa: F401
