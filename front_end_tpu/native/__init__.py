"""Native (C++) runtime components, built lazily with the system toolchain.

The compute path of the framework is JAX/XLA/Pallas; the host runtime
around it — frame decode, ring buffering, IO overlap — is native C++, as
it is in the reference (vidDebug ring recorder, ROS node queues).  Shared
objects are compiled on first use into ``_build/`` and cached by source
mtime, so the repo ships sources, not binaries.
"""
from __future__ import annotations

import os
import subprocess

_HERE = os.path.dirname(os.path.abspath(__file__))
_CSRC = os.path.normpath(os.path.join(_HERE, "..", "..", "csrc"))
_BUILD = os.path.join(_HERE, "_build")


class NativeBuildError(RuntimeError):
    pass


def _needs_build(src: str, out: str) -> bool:
    return (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(src))


def build_library(name: str, source: str, libs: tuple[str, ...] = ()) -> str:
    """Compile csrc/<source> into _build/lib<name>.so if stale; return path."""
    src = os.path.join(_CSRC, source)
    out = os.path.join(_BUILD, f"lib{name}.so")
    if not _needs_build(src, out):
        return out
    os.makedirs(_BUILD, exist_ok=True)
    cmd = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", src, "-o", out]
    cmd += [f"-l{lib}" for lib in libs]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except FileNotFoundError as e:
        raise NativeBuildError(f"no C++ toolchain: {e}") from e
    except subprocess.CalledProcessError as e:
        raise NativeBuildError(
            f"build of {source} failed:\n{e.stderr}") from e
    return out


def feed_library_path() -> str:
    """Build (if needed) and return the stereo-feed shared object."""
    return build_library("fefeed", "feed.cc", libs=("png", "z", "pthread"))
