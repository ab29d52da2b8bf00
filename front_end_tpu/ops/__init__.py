from front_end_tpu.ops import image, fast, grid, subpix, brief, orb, match  # noqa: F401
