from front_end_tpu.motion import kabsch, ransac, essential, lm  # noqa: F401
