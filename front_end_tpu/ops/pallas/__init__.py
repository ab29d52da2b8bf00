from front_end_tpu.ops.pallas import brief_kernel  # noqa: F401
