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


def _mask_stats(m):
    """count + mean/std of x and y over a boolean corner mask."""
    H, W = m.shape
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    mf = m.astype(jnp.float32)
    n = jnp.sum(mf)
    d = jnp.maximum(n, 1.0)
    mx = jnp.sum(xs * mf) / d
    my = jnp.sum(ys * mf) / d
    sx = jnp.sqrt(jnp.maximum(jnp.sum(xs * xs * mf) / d - mx * mx, 0.0))
    sy = jnp.sqrt(jnp.maximum(jnp.sum(ys * ys * mf) / d - my * my, 0.0))
    return n, mx, sx, my, sy


@jax.jit
def _map_stats_batch(smap, thresholds):
    """Per-threshold keypoint statistics from ONE response map.

    smap: (H, W); thresholds: (K,).  Returns count, mean/std of x and y
    for each threshold — all on-device, no per-ID host transfer.
    """
    return jax.vmap(lambda t: _mask_stats(smap > t))(
        jnp.asarray(thresholds, jnp.float32))


@jax.jit
def _fast_stats_batch(detect_map, score_map, thresholds, nms_flags):
    """Per-threshold cv2-exact FAST statistics from the two shared maps.

    cv2's NMS runs on the SPARSE thresholded response map (a neighbour
    that fails the threshold cannot suppress), and for 7_12/5_8 the
    detection gate (quick-rejection margins) differs from the response —
    so NMS does NOT commute with thresholding and must run per threshold.
    It is still one compiled program per circle type: the margin maps are
    computed once and the (threshold, nms) members vmap over cheap
    shift/compare passes.
    """
    def one(t, use_nms):
        corner = detect_map > t
        s = jnp.where(corner, score_map, 0.0)
        surviving = jnp.where(use_nms, fast_mod.nms_cv2(s) > 0, corner)
        return _mask_stats(surviving)

    return jax.vmap(one)(jnp.asarray(thresholds, jnp.float32),
                         jnp.asarray(nms_flags))


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
    if name == "FAST":
        # ONE (detect, score) margin-map pair serves every (threshold,
        # nms) member of the circle type; per-member NMS happens inside
        # the vmapped stats program (_fast_stats_batch).
        d_type = p.get("d_type", "9_16")
        nms = bool(p.get("non_maximum_suppression", True))
        key = ("FAST2", d_type)

        def fn(img):
            return jnp.stack(fast_mod.fast_margins(img, d_type))
        thr = float(p.get("threshold", p.get("fast_threshold", 15)))
        return key, fn, (thr, nms)
    if name == "ORB":
        # pyramid structure keys the compilation; the FAST threshold only
        # gates the margin-score response, so every fast_threshold ID in a
        # (n_levels, scale_factor, edge_threshold) group shares one map.
        from front_end_tpu.ops import orb as orb_mod
        nl = int(p.get("n_levels", 4))
        sf = float(p.get("scale_factor", 1.2))
        et = int(p.get("edge_threshold", 31))
        key = ("ORBPYR", nl, sf, et)

        def fn(img):
            return orb_mod.detect_dense_pyramid(
                img, n_levels=nl, scale_factor=sf, fast_threshold=1.0,
                edge_threshold=et)
        return key, fn, float(p.get("fast_threshold", 20))
    if name == "BRISK":
        # BRISK scores are per-octave FAST margins -> exact at any t
        from front_end_tpu.ops import brisk as brisk_mod
        no = max(1, int(p.get("n_octaves", 3)))
        key = ("BRISK", no)

        def fn(img):
            return brisk_mod.detect_dense(img, threshold=1.0, n_octaves=no)
        return key, fn, float(p.get("threshold", 30))
    if name == "AKAZE":
        # Hessian-det response; threshold only gates (akaze.py:293), the
        # spatial/scale suppression is threshold-independent -> exact
        from front_end_tpu.ops import akaze as akaze_mod
        no = int(p.get("n_octaves", 4))
        ns = int(p.get("n_octave_layers", p.get("n_sublevels", 4)))
        diff = str(p.get("diffusivity", "pm_g2"))
        key = ("AKAZE", no, ns, diff)

        def fn(img):
            return akaze_mod.detect_dense(img, threshold=1e-8,
                                          n_octaves=no, n_sublevels=ns,
                                          diffusivity=diff)
        return key, fn, float(p.get("threshold", 1e-3))
    if name == "SURF":
        # response = NMS'd det(H) maxima; hessian_threshold only gates.
        # Exact up to the static top-k keypoint capacity (1024), which a
        # tiny build threshold shares across every ID in the group.
        from front_end_tpu.ops import surf as surf_mod
        no = int(p.get("n_octaves", 3))
        nl_ = int(p.get("n_octave_layers", 2))
        key = ("SURF", no, nl_)

        def fn(img):
            return surf_mod.detect_dense(img, hessian_threshold=1e-6,
                                         n_octaves=no, n_octave_layers=nl_)
        return key, fn, float(p.get("hessian_threshold", 100))
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
        saturated_below = None
        if key[0] == "FAST2":
            thrs = [t for _, (t, _n) in members]
            nmsf = [n for _, (_t, n) in members]
            stats_l = _fast_stats_batch(sl[0], sl[1], thrs, nmsf)
            stats_r = _fast_stats_batch(sr[0], sr[1], thrs, nmsf)
        else:
            thrs = jnp.asarray([t for _, t in members], jnp.float32)
            stats_l = _map_stats_batch(sl, thrs)
            stats_r = _map_stats_batch(sr, thrs)
        jax.block_until_ready((stats_l, stats_r))
        dt = (time.perf_counter() - t0) / max(len(members), 1)
        if key[0] in ("ORBPYR", "SURF"):
            # these families build the shared map through a static top-k
            # keypoint capacity; when the near-zero build threshold fills
            # it, counts at thresholds at/below the weakest retained score
            # silently undercount — flag those records approximate instead
            # of reporting them as exact.  The probe does blocking device
            # fetches, so it runs OUTSIDE the timed region above to keep
            # the reported processingTime fetch-honest.
            cap = {"ORBPYR": 2048, "SURF": 1024}[key[0]]
            nz = max(int(jnp.sum(sl > 0)), int(jnp.sum(sr > 0)))
            if nz >= cap:
                smin = float(jnp.min(jnp.where(
                    sl > 0, sl, jnp.inf)))
                smin = min(smin, float(jnp.min(jnp.where(
                    sr > 0, sr, jnp.inf))))
                saturated_below = smin
        nl, mxl, sxl, myl, syl = (np.asarray(a) for a in stats_l)
        nr, mxr, sxr, myr, syr = (np.asarray(a) for a in stats_r)
        for i, (det_id, thr) in enumerate(members):
            approx = (saturated_below is not None
                      and not isinstance(thr, tuple)
                      and float(thr) <= saturated_below)
            rec = {
                "detID": det_id, "supported": True,
                "approximate": approx,
                "processingTime": [{"label": "detection", "seconds": dt}],
                "leftFeatures": {"nPoints": int(nl[i]),
                                 "X": (float(mxl[i]), float(sxl[i])),
                                 "Y": (float(myl[i]), float(syl[i]))},
                "rightFeatures": {"nPoints": int(nr[i]),
                                  "X": (float(mxr[i]), float(sxr[i])),
                                  "Y": (float(myr[i]), float(syr[i]))},
            }
            if return_kp:
                if key[0] == "FAST2":
                    t_i, nms_i = thr
                    sml = np.where(np.asarray(sl[0]) > t_i,
                                   np.asarray(sl[1]), 0.0)
                    smr = np.where(np.asarray(sr[0]) > t_i,
                                   np.asarray(sr[1]), 0.0)
                    if nms_i:
                        sml = np.asarray(fast_mod.nms_cv2(sml))
                        smr = np.asarray(fast_mod.nms_cv2(smr))
                    rec["left_score_map"] = sml
                    rec["right_score_map"] = smr
                else:
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
