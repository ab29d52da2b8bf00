from front_end_tpu.sim import synthetic  # noqa: F401
