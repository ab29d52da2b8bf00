"""Service-layer API — the reference's ROS services as plain functions.

Maps the `srv/` contract (`singleImageDetection`, `getStereoFeatures`,
`stereoMatching`, `windowMatching`, `controlDetection`) onto the TPU
framework.  Transport (HTTP/gRPC/CLI) is the caller's concern; these
functions ARE the service bodies:

- `single_image_detection`  <- `bin/feature_node:82-148` /
  `feature_node_cpp.cpp:23-66`: sweep detector IDs over one stereo pair,
  return counts, coordinate stats and per-ID timing.
- `get_stereo_features`     <- `bin/feature_node:36-77`.
- `stereo_matching`         <- `bin/stereo_node:20-27` (algorithm_one:
  epipolar mask -> masked KNN -> Lowe -> packed landmarks).
- `control_detection` / `window reset` live in `pipeline.control`.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from front_end_tpu import features as features_mod
from front_end_tpu.ops import brief as brief_mod
from front_end_tpu.ops import fast as fast_mod
from front_end_tpu.ops import grid as grid_mod
from front_end_tpu.ops import match as match_mod
from front_end_tpu.types import Keypoints


def keypoint_stats(score_map) -> dict:
    """`getKPstats` (`utils.py:139-158`): count + mean/std of x and y."""
    s = np.asarray(score_map)
    ys, xs = np.nonzero(s > 0)
    if len(xs) == 0:
        return {"nPoints": 0, "X": (0.0, 0.0), "Y": (0.0, 0.0)}
    return {"nPoints": int(len(xs)),
            "X": (float(xs.mean()), float(xs.std())),
            "Y": (float(ys.mean()), float(ys.std()))}


def single_image_detection(det_ids, left, right, return_kp: bool = False):
    """Sweep detector IDs over a stereo pair.

    Returns a list of `frameDetection`-shaped dicts: per ID the L/R
    keypoint statistics and a ProcTime record (the reference times each
    `detector.detect` call, `bin/feature_node:104-110`).
    """
    left = jnp.asarray(left, jnp.float32)
    right = jnp.asarray(right, jnp.float32)
    out = []
    for det_id in det_ids:
        fn, ok = features_mod.make_detector(det_id)
        rec = {"detID": det_id, "supported": bool(ok)}
        if not ok:
            out.append(rec)
            continue
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        sl = jfn(left)
        sr = jfn(right)
        jax.block_until_ready((sl, sr))
        rec["processingTime"] = [
            {"label": "detection", "seconds": time.perf_counter() - t0}]
        rec["leftFeatures"] = keypoint_stats(sl)
        rec["rightFeatures"] = keypoint_stats(sr)
        if return_kp:
            rec["left_score_map"] = np.asarray(sl)
            rec["right_score_map"] = np.asarray(sr)
        out.append(rec)
    return out


def get_stereo_features(det_id, desc_id, left, right,
                        cell_capacity: int = 384):
    """Detect + describe both images for one (det, desc) ID pair."""
    det_settings = features_mod.detector_table()[det_id]
    desc_fn, ok = features_mod.make_descriptor(desc_id)
    if not ok:
        raise ValueError(f"descriptor {desc_id} unsupported")
    left = jnp.asarray(left, jnp.float32)
    right = jnp.asarray(right, jnp.float32)

    cfg = grid_mod.GridConfig(cell_capacity=cell_capacity,
                              init_threshold=float(
                                  det_settings["Param"].get("threshold", 15)))
    detl = grid_mod.detect(left, cfg.init_thresholds(), cfg)
    detr = grid_mod.detect(right, cfg.init_thresholds(), cfg)
    dl = desc_fn(left, detl.keypoints.xy)
    dr = desc_fn(right, detr.keypoints.xy)
    return (detl.keypoints, dl), (detr.keypoints, dr)


def stereo_matching(kl: Keypoints, dl, kr: Keypoints, dr, *,
                    epi_threshold: float = 1.0, ratio: float = 0.8):
    """`algorithm_one` (`bin/stereo_node`, spec `algorithm.py:825-919`):
    epipolar mask -> masked KNN(2) -> Lowe -> uniqueness."""
    return match_mod.stereo_match_knn(kl, dl, kr, dr,
                                      epi_threshold=epi_threshold,
                                      ratio=ratio)
