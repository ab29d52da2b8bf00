from front_end_tpu.window import tracker  # noqa: F401
