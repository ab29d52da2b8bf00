from front_end_tpu.eval import metrics  # noqa: F401
