from front_end_tpu.viz import draw  # noqa: F401
