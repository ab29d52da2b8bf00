"""ORB: oriented FAST + rotated BRIEF (rBRIEF) with a real scale pyramid
and WTA_K ∈ {2, 3, 4}, batched for TPU.

Covers the reference's ORB configurations (`/root/reference/src/front_end/
features.py:292-387` sweeps scale_factor × n_levels × edge_threshold ×
WTA_K × patch_size × fast_threshold; `src/StereoCamera.cpp:422-521`
runtime ORB reconfig selecting NORM_HAMMING vs NORM_HAMMING2 by WTA_K):

- **scale pyramid**: each level is a `jax.image.resize` by
  `scale_factor**-level` (static shapes per level); FAST 9_16 runs per
  level with per-level top-k capacities allocated by area share (the
  OpenCV geometric distribution), `edge_threshold` border rejection, and
  keypoint coords/sizes mapped back to level-0 pixels;
- **orientation** by intensity centroid over a circular 31-px patch at
  the keypoint's level (atan2(m01, m10), like OpenCV);
- **descriptor** = steered pattern rotated by the keypoint angle,
  sampled on the smoothed level image;
- **WTA_K 3/4**: groups of K pattern points; each group emits the
  argmax index, one-hot encoded into K bits.  On one-hot codes the
  standard Hamming matmul engine returns exactly 2× the NORM_HAMMING2
  distance (G + G − 2·agreements), so ordering, cross-check and Lowe
  ratios are identical to OpenCV's HAMMING2 matcher with zero extra
  machinery — `features.matcher_norm` reports NORM_HAMMING2 for these
  IDs as the reference's `setDetector` does.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from front_end_tpu.ops import brief as brief_mod
from front_end_tpu.ops import fast as fast_mod
from front_end_tpu.types import Descriptors, Keypoints

ORIENT_PATCH = 31


def intensity_centroid_angle(img, xy):
    """Keypoint orientation: angle of the intensity centroid of the 31×31
    patch (radians).  img: (H, W) raw (unsmoothed) image; xy: (N, 2).

    TPU-native form: the windowed moments m10/m01 are CONVOLUTIONS of
    the image with the (circ·x) / (circ·y) kernels, so both moment maps
    are built densely on the MXU (one lax.conv with 2 output channels)
    and each keypoint costs two point-samples — replacing a (N, 31, 31)
    patch gather that serialized on TPU (~30 ms at N=2304; the conv
    formulation is <1 ms)."""
    r = ORIENT_PATCH // 2
    gy, gx = np.mgrid[-r:r + 1, -r:r + 1].astype(np.float32)
    circ = (gx**2 + gy**2 <= r * r).astype(np.float32)
    # lax.conv_general_dilated computes CORRELATION, so the (x·circ),
    # (y·circ) windows are used unflipped
    kx = gx * circ
    ky = gy * circ
    kern = jnp.asarray(np.stack([kx, ky])[:, None])   # (O=2, I=1, kh, kw)

    imgf = jnp.asarray(img, jnp.float32)[None, None]  # (1, 1, H, W)
    mom = jax.lax.conv_general_dilated(
        imgf, kern, window_strides=(1, 1), padding="SAME")[0]  # (2, H, W)

    xi = jnp.round(jnp.asarray(xy)[:, 0]).astype(jnp.int32)
    yi = jnp.round(jnp.asarray(xy)[:, 1]).astype(jnp.int32)
    H, W = imgf.shape[-2:]
    xi = jnp.clip(xi, 0, W - 1)
    yi = jnp.clip(yi, 0, H - 1)
    flat = mom.reshape(2, -1)
    idx = yi * W + xi
    m10 = flat[0, idx]
    m01 = flat[1, idx]
    return jnp.arctan2(m01, m10)


@functools.lru_cache(maxsize=16)
def _wta_pattern_np(groups: int, k: int, patch: int, seed: int):
    rng = np.random.RandomState(seed)
    pts = np.clip(rng.normal(0.0, patch / 5.0, (groups, k, 2)),
                  -(patch // 2), patch // 2).astype(np.float32)
    return pts


def describe(img_smooth, xy, angle, n_bytes: int = 32, *,
             wta_k: int = 2, pattern_seed: int = 7) -> Descriptors:
    """Steered BRIEF / WTA_K descriptor.

    img_smooth: output of `brief.smooth`; xy: (N,2); angle: (N,) radians.
    wta_k=2: n_bytes*8 pairwise sign bits (classic rBRIEF).
    wta_k=3/4: n_bytes*4 two-bit groups, one-hot encoded (see module doc).
    """
    n_bits = 8 * n_bytes
    H, W = img_smooth.shape[-2:]
    if wta_k == 2:
        pts = brief_mod._brief_pattern_np(                    # (G,2,2)
            n_bits, brief_mod.PATCH, pattern_seed).astype(np.float32)
    else:
        groups = n_bits // 2
        pts = _wta_pattern_np(groups, wta_k, 31, pattern_seed)  # (G,k,2)
    patf = jnp.asarray(pts)

    ca, sa = jnp.cos(angle), jnp.sin(angle)                   # (N,)
    px = (patf[None, ..., 0] * ca[:, None, None]
          - patf[None, ..., 1] * sa[:, None, None])
    py = (patf[None, ..., 0] * sa[:, None, None]
          + patf[None, ..., 1] * ca[:, None, None])
    cx = jnp.round(jnp.asarray(xy)[:, 0]).astype(jnp.int32)
    cy = jnp.round(jnp.asarray(xy)[:, 1]).astype(jnp.int32)
    ix = jnp.clip(cx[:, None, None] + jnp.round(px).astype(jnp.int32),
                  0, W - 1)
    iy = jnp.clip(cy[:, None, None] + jnp.round(py).astype(jnp.int32),
                  0, H - 1)
    flat = img_smooth.reshape(-1)
    vals = flat[iy * W + ix]                                  # (N,G,k)
    if wta_k == 2:
        bits = (vals[..., 0] < vals[..., 1]).astype(jnp.float32)
    else:
        win = jnp.argmax(vals, axis=-1)                       # (N,G)
        bits = jax.nn.one_hot(win, wta_k,
                              dtype=jnp.float32).reshape(vals.shape[0], -1)
    return Descriptors(bits=bits)


class OrbDetections(NamedTuple):
    keypoints: Keypoints      # xy in level-0 coords; angle filled
    octave: jnp.ndarray       # (K,) int32 pyramid level
    size: jnp.ndarray         # (K,) patch diameter at level-0 scale


def _level_budgets(total: int, n_levels: int, scale_factor: float):
    """OpenCV's geometric per-level feature allocation: level l gets a
    share ∝ (1/scale_factor²)^l (area share), summing to `total`."""
    f = 1.0 / (scale_factor * scale_factor)
    w = np.power(f, np.arange(n_levels))
    b = np.maximum((total * w / w.sum()).astype(int), 16)
    b[0] += max(total - int(b.sum()), 0)    # keep sum >= total (global
    return [int(x) for x in b]              # top-k needs enough rows)


def detect_describe_pyramid(img, *, n_levels: int = 4,
                            scale_factor: float = 1.2,
                            fast_threshold: float = 20.0,
                            edge_threshold: int = 31,
                            max_keypoints: int = 1024,
                            n_bytes: int = 32, wta_k: int = 2,
                            pattern_seed: int = 7,
                            with_descriptors: bool = True):
    """Full ORB: pyramid FAST + centroid orientation + steered WTA_K
    descriptors.  Returns (OrbDetections, Descriptors) with capacity
    `max_keypoints` (invalid rows padded).

    with_descriptors=False skips the per-level smooth + orientation +
    WTA sampling entirely (detection-only sweep path) and returns
    zero descriptors/angles."""
    img = jnp.asarray(img, jnp.float32)
    H, W = img.shape
    budgets = _level_budgets(max_keypoints, n_levels, scale_factor)

    per_level = []
    for lvl in range(n_levels):
        s = float(scale_factor) ** lvl
        h, w = max(int(round(H / s)), 64), max(int(round(W / s)), 64)
        lv = (img if lvl == 0 else
              jax.image.resize(img, (h, w), method="linear"))
        smap = fast_mod.detect_dense(lv, fast_threshold, "9_16", nms=True)
        # edge_threshold border rejection at the level resolution
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        et = int(edge_threshold)
        interior = ((ys >= et) & (ys < h - et) & (xs >= et) & (xs < w - et))
        smap = jnp.where(interior, smap, 0.0)

        k = budgets[lvl]
        v, idx = jax.lax.top_k(smap.reshape(-1), k)
        yy = (idx // w).astype(jnp.float32)
        xx = (idx % w).astype(jnp.float32)
        xy_lvl = jnp.stack([xx, yy], -1)
        if with_descriptors:
            ang = intensity_centroid_angle(lv, xy_lvl)
            sm = brief_mod.smooth(lv)
            desc = describe(sm, xy_lvl, ang, n_bytes, wta_k=wta_k,
                            pattern_seed=pattern_seed)
            bits = desc.bits
        else:
            ang = jnp.zeros((k,), jnp.float32)
            bits = jnp.zeros((k, 0), jnp.float32)
        per_level.append(dict(
            xy=xy_lvl * s, score=v, angle=ang, valid=v > 0,
            octave=jnp.full((k,), lvl, jnp.int32),
            size=jnp.full((k,), 31.0 * s, jnp.float32),
            bits=bits))

    cat = {k: jnp.concatenate([p[k] for p in per_level])
           for k in per_level[0]}
    # global top max_keypoints by score so capacity is exact
    v, sel = jax.lax.top_k(jnp.where(cat["valid"], cat["score"], -1.0),
                           max_keypoints)
    kps = Keypoints(xy=cat["xy"][sel], score=v, angle=cat["angle"][sel],
                    valid=v > 0)
    det = OrbDetections(keypoints=kps, octave=cat["octave"][sel],
                        size=cat["size"][sel])
    return det, Descriptors(bits=cat["bits"][sel])


def detect_dense_pyramid(img, *, n_levels: int = 4,
                         scale_factor: float = 1.2,
                         fast_threshold: float = 20.0,
                         edge_threshold: int = 31,
                         max_keypoints: int = 2048):
    """Score-map form for the sweep/services API: pyramid keypoints
    scattered into a level-0 map (corners = map > 0), like
    `surf.detect_dense`."""
    det, _ = detect_describe_pyramid(
        img, n_levels=n_levels, scale_factor=scale_factor,
        fast_threshold=fast_threshold, edge_threshold=edge_threshold,
        max_keypoints=max_keypoints, with_descriptors=False)
    H, W = jnp.asarray(img).shape
    yy = jnp.clip(det.keypoints.xy[:, 1].astype(jnp.int32), 0, H - 1)
    xx = jnp.clip(det.keypoints.xy[:, 0].astype(jnp.int32), 0, W - 1)
    vals = jnp.where(det.keypoints.valid, det.keypoints.score, 0.0)
    return jnp.zeros((H, W), jnp.float32).at[yy, xx].max(vals)


def detect_describe(img, keypoints, n_bytes: int = 32, *, wta_k: int = 2):
    """Convenience: orientation + steered descriptors for a Keypoints set
    produced by the grid/FAST detector (single-level path)."""
    sm = brief_mod.smooth(img)
    ang = intensity_centroid_angle(img, keypoints.xy)
    desc = describe(sm, keypoints.xy, ang, n_bytes, wta_k=wta_k)
    kps = keypoints.replace(angle=ang)
    return kps, desc
