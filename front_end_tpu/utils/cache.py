"""Persistent XLA compilation cache setup.

Compiling the full VO pipeline for TPU over the remote link costs
minutes; caching compiled executables under the repo makes every
subsequent bench/profile/test run start hot.  Call `enable()` before the
first jit (bench.py and the CLI do).
"""
from __future__ import annotations

import os

CACHE_DIR = os.environ.get(
    "FE_TPU_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"))


def enable(path: str | None = None) -> None:
    import jax

    p = path or CACHE_DIR
    os.makedirs(p, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", p)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
