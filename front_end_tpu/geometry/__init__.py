from front_end_tpu.geometry import se3, camera  # noqa: F401
