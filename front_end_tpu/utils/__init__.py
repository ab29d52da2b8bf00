from front_end_tpu.utils.precision import f32_precision  # noqa: F401
