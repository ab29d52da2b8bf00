"""FAST corner detection as a dense TPU stencil.

Rebuild of the capability of `cv::FASTX` as used by the reference's hot
loop (`/root/reference/src/live_stereo.cpp:293,306` — TYPE_7_12 with NMS)
and the Python grid detector (`src/front_end/features.py:609-641`, 9_16).

Design: instead of the sparse candidate scan OpenCV performs per pixel,
the segment test is evaluated DENSELY for every pixel as ~600 fused VPU
ops over shifted copies of the image — no data-dependent control flow,
one XLA program, batchable over images.  The per-pixel score is the exact
FAST margin score (max threshold at which the pixel stays a corner), so
`score > t` reproduces the detector at any threshold and the adaptive
grid controller can reuse one score map for every cell's threshold.

Non-max suppression is a 3×3 reduce-window on a tie-broken integer score.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from front_end_tpu.ops.image import shift2d

# Bresenham circles, clockwise from 12 o'clock; (dx, dy) with y down.
CIRCLE_16 = ((0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2),
             (1, 3), (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1),
             (-2, -2), (-1, -3))
CIRCLE_12 = ((0, -2), (1, -2), (2, -1), (2, 0), (2, 1), (1, 2), (0, 2),
             (-1, 2), (-2, 1), (-2, 0), (-2, -1), (-1, -2))
CIRCLE_8 = ((0, -1), (1, -1), (1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0),
            (-1, -1))

# (circle, contiguous arc length) per OpenCV type
TYPES = {"9_16": (CIRCLE_16, 9), "7_12": (CIRCLE_12, 7),
         "5_8": (CIRCLE_8, 5)}


def fast_score_map(img, fast_type: str = "9_16"):
    """Dense FAST margin score: (..., H, W) -> (..., H, W) float32.

    score[p] = max over contiguous arcs A of length K of
               max( min_{i∈A}(c_i − p),  min_{i∈A}(p − c_i) )
    i.e. the largest threshold t for which p passes the segment test.
    Border pixels (within circle radius) score 0.
    """
    circle, K = TYPES[fast_type]
    img = jnp.asarray(img, jnp.float32)
    n = len(circle)
    # neighbor stack: (n, ..., H, W)
    neigh = jnp.stack([shift2d(img, dy, dx) for (dx, dy) in circle])
    diff = neigh - img[None]                       # c_i − p

    def arc_score_exact(d):
        # max over circular starts s of min over window j<K of d[s+j]
        dd = jnp.concatenate([d, d[:K - 1]], axis=0)
        m = dd[:n]
        for j in range(1, K):
            m = jnp.minimum(m, dd[j:j + n])
        return jnp.max(m, axis=0)

    bright = arc_score_exact(-diff)                # p − c_i margin
    dark = arc_score_exact(diff)                   # c_i − p margin
    score = jnp.maximum(bright, dark)

    # zero the border (circle radius)
    r = max(max(abs(dx), abs(dy)) for dx, dy in circle)
    H, W = img.shape[-2:]
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = ((ys >= r) & (ys < H - r) & (xs >= r) & (xs < W - r))
    return jnp.where(interior, score, 0.0)


def nms3x3(score):
    """3×3 non-max suppression with deterministic tie-break.

    Returns the score map with non-maxima zeroed.  Ties are broken by
    flat pixel index (first occurrence wins), encoded into the low bits
    of an int32 composite so reduce-window max stays exact.
    """
    score = jnp.asarray(score)
    H, W = score.shape[-2:]
    q = jnp.round(jnp.asarray(score, jnp.float32) * 4.0).astype(jnp.int32)
    idx = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
           + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1))
    # higher score wins; equal score -> smaller index wins.  The index is
    # wrapped to 20 bits: within any 3×3 window indices differ by <= W+1,
    # so pairwise comparisons stay consistent (a wrap can flip an ordering
    # only between pixels ~2^20 apart, never neighbours).
    comp = q * (1 << 20) + ((1 << 20) - 1 - (idx & 0xFFFFF))
    neigh_max = jnp.full_like(comp, jnp.iinfo(jnp.int32).min)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neigh_max = jnp.maximum(neigh_max,
                                    shift2d(comp, dy, dx))
    keep = comp > neigh_max
    return jnp.where(keep, score, 0.0)


def detect_dense(img, threshold, fast_type: str = "9_16", nms: bool = True):
    """Score map thresholded (and optionally NMS'd): corners = map > 0.

    `threshold` may be a scalar or a per-pixel map (the adaptive grid
    controller passes a per-cell threshold image).
    """
    s = fast_score_map(img, fast_type)
    s = jnp.where(s > jnp.asarray(threshold, jnp.float32), s, 0.0)
    if nms:
        s = nms3x3(s)
    return s
