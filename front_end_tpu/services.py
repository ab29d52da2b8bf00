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


@jax.jit
def _map_stats_batch(smap, thresholds):
    """Per-threshold keypoint statistics from ONE response map.

    smap: (H, W); thresholds: (K,).  Returns count, mean/std of x and y
    for each threshold — all on-device, no per-ID host transfer.
    """
    H, W = smap.shape
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)

    def one(t):
        m = (smap > t).astype(jnp.float32)
        n = jnp.sum(m)
        d = jnp.maximum(n, 1.0)
        mx = jnp.sum(xs * m) / d
        my = jnp.sum(ys * m) / d
        sx = jnp.sqrt(jnp.maximum(jnp.sum(xs * xs * m) / d - mx * mx, 0.0))
        sy = jnp.sqrt(jnp.maximum(jnp.sum(ys * ys * m) / d - my * my, 0.0))
        return n, mx, sx, my, sy

    return jax.vmap(one)(jnp.asarray(thresholds, jnp.float32))


# jitted response-map builders cached per structural configuration:
# the traced `threshold` argument is applied AFTER the response map, so
# every ID in a structural group shares one compilation.
_RESPONSE_CACHE: dict = {}


def _structural_response_fn(settings):
    """Settings -> (key, fn(img) -> threshold-independent response map).

    The FAST margin score (`ops/fast.py:41-74`) is exactly the largest
    threshold at which a pixel stays a corner, so `map > t` reproduces
    the detector at ANY threshold; NMS commutes with thresholding for a
    margin score (a suppressing neighbour always clears any threshold the
    suppressed pixel clears), so one NMS'd map serves every NMS ID too.
    Other families whose threshold only gates their response reuse the
    same trick where valid; structurally distinct params (octave counts,
    diffusivity, circle type) key separate compilations.
    """
    name, p = settings["Name"], settings["Param"]
    if name in ("FAST", "ORB"):
        d_type = p.get("d_type", "9_16")
        nms = bool(p.get("non_maximum_suppression", True))
        key = ("FAST", d_type, nms)

        def fn(img):
            s = fast_mod.fast_score_map(img, d_type)
            return fast_mod.nms3x3(s) if nms else s
        thr = float(p.get("threshold", p.get("fast_threshold", 15)))
        return key, fn, thr
    return None, None, None


def single_image_detection(det_ids, left, right, return_kp: bool = False):
    """Sweep detector IDs over a stereo pair.

    Returns a list of `frameDetection`-shaped dicts: per ID the L/R
    keypoint statistics and a ProcTime record (the reference times each
    `detector.detect` call, `bin/feature_node:104-110`).

    Unlike the reference's per-ID detector loop (`feature_node_cpp.cpp:
    23-66`), IDs that share a structural configuration are batched: the
    FAST family computes ONE margin-score map (+ one NMS map) per circle
    type and evaluates every threshold against it in a single vmapped
    stats program, so the full 354-ID FAST sweep costs three detector
    launches instead of 354 recompilations.
    """
    left = jnp.asarray(left, jnp.float32)
    right = jnp.asarray(right, jnp.float32)

    resolved = []
    for det_id in det_ids:
        settings = (features_mod.detector_table()[det_id]
                    if isinstance(det_id, str) else det_id)
        resolved.append((det_id, settings))

    # ---- group the margin-score families ------------------------------
    groups: dict = {}
    rest = []
    for det_id, settings in resolved:
        key, fn, thr = _structural_response_fn(settings)
        if key is None:
            rest.append((det_id, settings))
        else:
            groups.setdefault(key, (fn, []))[1].append((det_id, thr))

    records = {}
    for key, (fn, members) in groups.items():
        if key not in _RESPONSE_CACHE:
            _RESPONSE_CACHE[key] = jax.jit(fn)
        jfn = _RESPONSE_CACHE[key]
        t0 = time.perf_counter()
        sl = jfn(left)
        sr = jfn(right)
        thrs = jnp.asarray([t for _, t in members], jnp.float32)
        stats_l = _map_stats_batch(sl, thrs)
        stats_r = _map_stats_batch(sr, thrs)
        jax.block_until_ready((stats_l, stats_r))
        dt = (time.perf_counter() - t0) / max(len(members), 1)
        nl, mxl, sxl, myl, syl = (np.asarray(a) for a in stats_l)
        nr, mxr, sxr, myr, syr = (np.asarray(a) for a in stats_r)
        for i, (det_id, thr) in enumerate(members):
            rec = {
                "detID": det_id, "supported": True,
                "processingTime": [{"label": "detection", "seconds": dt}],
                "leftFeatures": {"nPoints": int(nl[i]),
                                 "X": (float(mxl[i]), float(sxl[i])),
                                 "Y": (float(myl[i]), float(syl[i]))},
                "rightFeatures": {"nPoints": int(nr[i]),
                                  "X": (float(mxr[i]), float(sxr[i])),
                                  "Y": (float(myr[i]), float(syr[i]))},
            }
            if return_kp:
                rec["left_score_map"] = np.where(
                    np.asarray(sl) > thr, np.asarray(sl), 0.0)
                rec["right_score_map"] = np.where(
                    np.asarray(sr) > thr, np.asarray(sr), 0.0)
            records[id(det_id) if not isinstance(det_id, str) else det_id] \
                = rec

    # ---- remaining families: structural-key jit cache ------------------
    for det_id, settings in rest:
        fn, ok = features_mod.make_detector(settings)
        rec = {"detID": det_id, "supported": bool(ok)}
        if ok:
            skey = (settings["Name"],
                    tuple(sorted((k, str(v))
                                 for k, v in settings["Param"].items())))
            if skey not in _RESPONSE_CACHE:
                _RESPONSE_CACHE[skey] = jax.jit(fn)
            jfn = _RESPONSE_CACHE[skey]
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
        records[id(det_id) if not isinstance(det_id, str) else det_id] = rec

    return [records[id(d) if not isinstance(d, str) else d]
            for d in det_ids]


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
