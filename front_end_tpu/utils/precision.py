"""Matmul precision control for geometry-critical code.

On TPU, float32 matmuls/einsums default to one bf16 MXU pass, which costs
millimetres in pose estimates (observed: ~4 mm translation error on ideal
data through the Kabsch/SVD path).  `@f32_precision` pins true float32
precision for everything under the decorated entry point.

Descriptor matching is unaffected: `match.hamming_matrix` feeds the MXU
explicit bf16 operands, and the precision context only governs f32
inputs — so the hot matmuls stay at full bf16 speed while the geometry
stays accurate.
"""
from __future__ import annotations

import functools

import jax


def f32_precision(fn):
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)
    return wrapper
