"""Detector/descriptor parameter-sweep tables with stable hex IDs.

Rebuild of the reference's configuration backbone
(`/root/reference/src/front_end/features.py:37-467`): every detector
family enumerates a parameter grid; the ordered concatenation of all
family combination lists is hashed to stable IDs `Det%010X` / `Desc%010X`
(`features.py:408-431`), which flow through services, YAML exports and
benchmark reports (`bin/genDetectorDescriptorTable`,
`feature_node_cpp.cpp:80`).

The grids below mirror the reference's value ranges exactly (so ID sets
have the same cardinality per family); `make_detector`/`make_descriptor`
return TPU callables for the families the framework implements, and
(None, False) for the rest — the reference's own factory contract
(`features.py:441-462`).
"""
from __future__ import annotations

import functools
import itertools
from typing import Callable

import numpy as np

# --- parameter grids (values mirror features.py:37-387) -------------------

FAST_PARAMS = {
    "threshold": list(range(1, 60)),                 # features.py:38
    "d_type": ["5_8", "7_12", "9_16"],
    "non_maximum_suppression": [True, False],
}
BRIEF_PARAMS = {
    "bytes": [16, 32, 64],                           # features.py:72
    "use_orientation": [1, 0],
}
SURF_PARAMS = {
    "hessian_threshold": list(range(10, 550, 10)),   # features.py:101
    "n_octaves": [2, 4],
    "n_octave_layers": [2, 3, 4, 5],
    "extended": [1, 0],
    "upright": [1, 0],
}
BRISK_PARAMS = {
    "threshold": list(range(4, 70, 3)),              # features.py:164
    "n_octaves": [2, 4],
    "pattern_scale": [1.0],
}
AKAZE_PARAMS = {
    "threshold": [1e-4, 5e-4, 1e-3, 5e-3],
    "n_octaves": [2, 4],
    "n_octave_layers": [2, 4],
    "diffusivity": ["weickert", "charbonnier", "pm_g1", "pm_g2"],
    "descriptor_size": [64, 256, 486],
}
ORB_PARAMS = {
    "scale_factor": [1.1, 1.2, 1.3],
    "n_levels": [2, 4],
    "edge_threshold": list(range(5, 50, 10)),        # features.py:296
    "wta_k": [3, 4],
    "score_type": ["fast"],
    "patch_size": [10, 30, 50],
    "fast_threshold": list(range(1, 50, 6)),
}


def _combos(name, grid, keys, norm):
    vals = [grid[k] for k in keys]
    return [{"Name": name, "Param": dict(zip(keys, c)), "NormType": norm}
            for c in itertools.product(*vals)]


def fast_combinations():
    return _combos("FAST", FAST_PARAMS,
                   ["threshold", "d_type", "non_maximum_suppression"],
                   "NORM_HAMMING")


def brief_combinations():
    return _combos("BRIEF", BRIEF_PARAMS, ["bytes", "use_orientation"],
                   "NORM_HAMMING")


def surf_detector_combinations():
    return _combos("SURF", SURF_PARAMS,
                   ["hessian_threshold", "n_octaves", "n_octave_layers"],
                   "NORM_L2")


def surf_descriptor_combinations():
    return _combos("SURF", SURF_PARAMS, ["extended", "upright"], "NORM_L2")


def brisk_combinations():
    return _combos("BRISK", BRISK_PARAMS,
                   ["threshold", "n_octaves", "pattern_scale"],
                   "NORM_HAMMING")


def akaze_detector_combinations():
    return _combos("AKAZE", AKAZE_PARAMS,
                   ["threshold", "n_octaves", "n_octave_layers",
                    "diffusivity"], "NORM_HAMMING")


def orb_detector_combinations():
    return _combos("ORB", ORB_PARAMS,
                   ["scale_factor", "n_levels", "edge_threshold",
                    "fast_threshold"], "NORM_HAMMING")


@functools.lru_cache(maxsize=1)
def detector_table():
    """ID -> settings; ordering mirrors `features.py:410-415` (ORB, BRISK,
    FAST, SURF, BRISK again, AKAZE — the duplicate is in the reference)."""
    allset = (orb_detector_combinations() + brisk_combinations()
              + fast_combinations() + surf_detector_combinations()
              + brisk_combinations() + akaze_detector_combinations())
    return {f"Det{d:010X}": s for d, s in enumerate(allset)}


FREAK_PARAMS = {"pattern_scale": [0.5, 1.0, 1.5, 2.0]}
ORB_DESC_PARAMS = {"bytes": [32], "wta_k": [2, 3, 4]}   # HAMMING2 for 3/4


def freak_combinations():
    return _combos("FREAK", FREAK_PARAMS, ["pattern_scale"], "NORM_HAMMING")


def orb_descriptor_combinations():
    return _combos("ORB", ORB_DESC_PARAMS, ["bytes", "wta_k"],
                   "NORM_HAMMING")


@functools.lru_cache(maxsize=1)
def descriptor_table():
    """Reference table is SURF-descriptors-only (`features.py:424-431`);
    the BRIEF/FREAK/ORB descriptor configs the reference constructs
    directly in `bin/detect_node:24-54` are appended so every benchmarked
    configuration has a stable ID here."""
    allset = (brief_combinations() + surf_descriptor_combinations()
              + freak_combinations() + orb_descriptor_combinations())
    return {f"Desc{d:010X}": s for d, s in enumerate(allset)}


def ids_for(name: str, table: dict) -> list[str]:
    return [k for k, v in table.items() if v["Name"] == name]


# --- factories -------------------------------------------------------------

def make_detector(settings) -> tuple[Callable | None, bool]:
    """Settings (or Det-ID) -> (detect_fn, supported).

    detect_fn(img) -> score map (H, W); corners are `map > 0`.  Families
    without a TPU implementation yet return (None, False), matching the
    reference factory's miss path (`features.py:441-455`).
    """
    if isinstance(settings, str):
        settings = detector_table()[settings]
    name, p = settings["Name"], settings["Param"]
    if name == "FAST":
        from front_end_tpu.ops import fast as fast_mod

        def detect(img):
            return fast_mod.detect_dense(
                img, float(p["threshold"]), fast_type=p["d_type"],
                nms=bool(p["non_maximum_suppression"]))
        return detect, True
    if name == "ORB":
        from front_end_tpu.ops import orb as orb_mod

        def detect(img):
            return orb_mod.detect_dense_pyramid(
                img, n_levels=int(p.get("n_levels", 4)),
                scale_factor=float(p.get("scale_factor", 1.2)),
                fast_threshold=float(p["fast_threshold"]),
                edge_threshold=int(p.get("edge_threshold", 31)))
        return detect, True
    if name == "SURF":
        try:
            from front_end_tpu.ops import surf as surf_mod
        except ImportError:
            return None, False

        def detect(img):
            return surf_mod.detect_dense(
                img, hessian_threshold=float(p["hessian_threshold"]),
                n_octaves=int(p["n_octaves"]),
                n_octave_layers=int(p["n_octave_layers"]))
        return detect, True
    if name == "BRISK":
        from front_end_tpu.ops import brisk as brisk_mod

        def detect(img):
            return brisk_mod.detect_dense(
                img, threshold=float(p["threshold"]),
                n_octaves=max(1, int(p["n_octaves"])))
        return detect, True
    if name == "AKAZE":
        from front_end_tpu.ops import akaze as akaze_mod

        def detect(img):
            return akaze_mod.detect_dense(
                img, threshold=float(p["threshold"]),
                n_octaves=int(p["n_octaves"]),
                n_sublevels=int(p["n_octave_layers"]),
                diffusivity=str(p["diffusivity"]))
        return detect, True
    return None, False


def make_descriptor(settings) -> tuple[Callable | None, bool]:
    """Settings (or Desc-ID) -> (describe_fn, supported).

    describe_fn(img, xy) -> Descriptors.
    """
    if isinstance(settings, str):
        settings = descriptor_table()[settings]
    name, p = settings["Name"], settings["Param"]
    if name == "BRIEF":
        from front_end_tpu.ops import brief as brief_mod

        def describe(img, xy):
            sm = brief_mod.smooth(img)
            return brief_mod.describe_dense(sm, xy, int(p["bytes"]))
        return describe, True
    if name == "SURF":
        try:
            from front_end_tpu.ops import surf as surf_mod
        except ImportError:
            return None, False

        def describe(img, xy):
            return surf_mod.describe(img, xy, extended=bool(p["extended"]),
                                     upright=bool(p["upright"]))
        return describe, True
    if name == "FREAK":
        from front_end_tpu.ops import freak as freak_mod
        from front_end_tpu.types import Keypoints
        import jax.numpy as jnp

        def describe(img, xy):
            n = xy.shape[0]
            kps = Keypoints(xy=jnp.asarray(xy),
                            score=jnp.ones((n,), jnp.float32),
                            angle=jnp.zeros((n,), jnp.float32),
                            valid=jnp.ones((n,), bool))
            _, desc = freak_mod.describe_keypoints(
                img, kps, pattern_scale=float(p.get("pattern_scale", 1.0)))
            return desc
        return describe, True
    if name == "ORB":
        from front_end_tpu.ops import brief as brief_mod
        from front_end_tpu.ops import orb as orb_mod

        def describe(img, xy):
            import jax.numpy as jnp
            sm = brief_mod.smooth(jnp.asarray(img, jnp.float32))
            ang = orb_mod.intensity_centroid_angle(sm, xy)
            return orb_mod.describe(sm, xy, ang,
                                    n_bytes=int(p.get("bytes", 32)),
                                    wta_k=int(p.get("wta_k", 2)))
        return describe, True
    return None, False


def matcher_norm(settings) -> str:
    """The reference's `getMatcher` capability (`features.py:464-467`)
    plus `StereoCamera.cpp:473-517`'s WTA_K-driven norm selection:
    NORM_HAMMING -> MXU hamming_matrix; NORM_L2 -> l2sq_matrix;
    NORM_HAMMING2 (ORB WTA_K 3/4) -> the same hamming matmul over the
    one-hot group codes, which equals 2x the HAMMING2 distance
    (order-identical; see ops/orb.py module doc)."""
    p = settings.get("Param", {})
    if settings.get("Name") == "ORB" and int(p.get("wta_k", 2)) > 2:
        return "NORM_HAMMING2"
    return settings.get("NormType", "NORM_HAMMING")


def export_table_yaml(path: str):
    """`bin/genDetectorDescriptorTable` equivalent: dump the tables in a
    YAML-ish FileStorage layout for external consumers."""
    lines = ["%YAML:1.0", "---"]
    for table, _tag in ((detector_table(), "det"),
                        (descriptor_table(), "desc")):
        for k, v in table.items():
            params = ", ".join(f'"{x}"' for x in map(str, v["Param"].values()))
            lines.append(f"{k}:")
            lines.append(f"   Name: {v['Name']}")
            lines.append(f"   Param: [ {params} ]")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return len(detector_table()) + len(descriptor_table())
