from front_end_tpu.io import feed  # noqa: F401
