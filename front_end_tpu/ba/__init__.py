from front_end_tpu.ba import factors, schur, distributed  # noqa: F401
