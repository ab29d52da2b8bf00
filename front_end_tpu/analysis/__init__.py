from front_end_tpu.analysis import sweeps  # noqa: F401
