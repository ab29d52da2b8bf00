from front_end_tpu.pipeline import vo  # noqa: F401
