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


def _host_tag() -> str:
    """CPU-feature fingerprint subdirectory: XLA:CPU AOT artifacts are
    machine-feature specific, and reusing another host's cache entries
    logs SIGILL warnings (and can crash).  TPU entries are unaffected
    but cheap to recompile per host class."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    import hashlib
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform
    return platform.machine()


def enable(path: str | None = None) -> None:
    import jax

    p = os.path.join(path or CACHE_DIR, _host_tag())
    os.makedirs(p, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", p)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
