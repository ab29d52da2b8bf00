"""FAST corner detection as a dense TPU stencil — cv2-exact semantics.

Rebuild of the capability of `cv::FASTX` as used by the reference's hot
loop (`/root/reference/src/live_stereo.cpp:293,306` — TYPE_7_12 with NMS)
and the Python grid detector (`src/front_end/features.py:609-641`, 9_16).

Design: instead of the sparse candidate scan OpenCV performs per pixel,
the segment test is evaluated DENSELY for every pixel as fused VPU ops
over static slices of ONE padded copy of the image (`shift_views`) — no
data-dependent control flow, one XLA program, batchable over images.

Parity with OpenCV is exact, which requires replicating two quirks of
its shared `FAST_t<patternSize>` template (verified empirically against
cv2 on this machine, see tests/test_opencv_parity.py):

1. The quick-rejection tests `tab[pixel[k]] | tab[pixel[k+8]]` (k=0..7)
   are written for patternSize 16 but run for ALL pattern sizes with the
   offset table wrapped modulo patternSize.  For 16 the 8 antipodal
   pairs are implied by any 9-run (lossless); for 12 the pairs sit at
   circular distance 4 and REJECT genuine 7-runs that avoid them; for 8
   every pair degenerates to a single pixel, so TYPE_5_8 only fires when
   ALL 8 neighbours are on the same side of the band.  Detection is
   therefore gated on min(quick_margin, run_margin), not the pure
   segment test.
2. The corner response (`cornerScore<patternSize>`) ignores the quick
   gates: it is the pure arc margin minus 1, and non-max suppression
   keeps a corner iff its response is STRICTLY greater than all 8
   neighbours' responses (0 at non-corners) — equal-score neighbours
   suppress each other, with no tie-break.

The per-pixel score is the margin (max threshold at which the pixel
stays a corner = cv2 response + 1), so `margin > t` reproduces the
detector at any threshold and the adaptive grid controller can reuse
one margin map for every cell's threshold.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from front_end_tpu.ops.image import shift_views

# Circle offsets (dx, dy) with y down, in OpenCV's exact `makeOffsets`
# order (offsets16/12/8 with (col, row) and +row = down).  The ORDER
# matters: the quick-test pairs are (k, (k+8) mod n) in THIS ordering.
CIRCLE_16 = ((0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2),
             (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0),
             (-3, 1), (-2, 2), (-1, 3))
CIRCLE_12 = ((0, 2), (1, 2), (2, 1), (2, 0), (2, -1), (1, -2), (0, -2),
             (-1, -2), (-2, -1), (-2, 0), (-2, 1), (-1, 2))
CIRCLE_8 = ((0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0),
            (-1, 1))

# (circle, contiguous run length K+1) per OpenCV type (K = patternSize/2)
TYPES = {"9_16": (CIRCLE_16, 9), "7_12": (CIRCLE_12, 7),
         "5_8": (CIRCLE_8, 5)}


def _arc_margin(d, K: int):
    """max over circular starts s of min over window j<K of d[(s+j) % n].

    d: (n, ..., H, W) per-circle-pixel margins.  Sparse-table doubling:
    2^a-wide window mins combine pairwise, an arbitrary K-window is the
    min of two overlapping 2^a-windows — BIT-exact (min is associative
    and idempotent) at ~log2(K) passes instead of K-1 (the dense FAST
    stage is elementwise-compute-bound; same trick as the Pallas
    kernel's `_arc_margin`)."""
    n = d.shape[0]
    w = d
    width = 1
    while width * 2 <= K:
        w = jnp.minimum(w, jnp.roll(w, -width, axis=0))
        width *= 2
    if width < K:
        w = jnp.minimum(w, jnp.roll(w, -(K - width), axis=0))
    return jnp.max(w, axis=0)


def _quick_margin(d):
    """min over cv2's 8 quick-test pairs (k, (k+8) mod n) of max margin."""
    n = d.shape[0]
    m = None
    for k in range(8):
        pair = jnp.maximum(d[k % n], d[(k + 8) % n])
        m = pair if m is None else jnp.minimum(m, pair)
    return m


def _is_batch_tracer(x) -> bool:
    """True when `x` is being traced under vmap — the Pallas kernel's
    ANY-memory-space input has no batching rule, so vmapped callers fall
    back to the XLA stencil (detect_pair avoids this by stacking the
    pair BEFORE the margin computation)."""
    t = x
    while isinstance(t, jax.core.Tracer):
        if type(t).__name__ == "BatchTracer":
            return True
        t = getattr(t, "val", None)
        if t is None:
            return False
    return False


def _border_mask(shape):
    """cv2 processes rows/cols [3, size-4] for EVERY pattern size."""
    H, W = shape[-2:]
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    return (ys >= 3) & (ys <= H - 4) & (xs >= 3) & (xs <= W - 4)


def fast_margins(img, fast_type: str = "9_16", *, backend: str = "auto"):
    """Dense FAST margins: (..., H, W) -> (detect_margin, score).

    score[p]   = max over contiguous arcs A of length K of
                 max( min_{i∈A}(c_i − p), min_{i∈A}(p − c_i) )
                 — the pure segment-test margin; cv2 response = score − 1.
    detect[p]  = the same but additionally gated (per brightness class)
                 by cv2's quick-rejection pair tests; the pixel is a
                 cv2 corner at threshold t iff detect[p] > t.
    For 9_16 the gates are implied by any 9-run, so detect == score.
    Border pixels (within 3 of the edge) have both margins 0.

    On TPU the margins come from the Pallas tile kernel
    (`ops/pallas/fast_kernel.py`, bit-identical, ~50x less HBM traffic);
    `backend="xla"` forces the dense-stencil formulation (also used
    automatically off-TPU and under vmap, where a Pallas ANY-space
    input cannot be batched).
    """
    img_a = jnp.asarray(img)
    if (backend == "auto" and img_a.ndim <= 3
            and jax.default_backend() == "tpu"
            and not _is_batch_tracer(img_a)):
        from front_end_tpu.ops.pallas import fast_kernel
        return fast_kernel.fast_margins_pallas(img_a, fast_type)
    circle, K = TYPES[fast_type]
    img = jnp.asarray(img, jnp.float32)
    n = len(circle)
    r = max(max(abs(dx), abs(dy)) for dx, dy in circle)
    view = shift_views(img, r)
    neigh = jnp.stack([view(dy, dx) for (dx, dy) in circle])
    dark = img[None] - neigh                       # p − c_i  (darker margin)
    bright = -dark                                 # c_i − p  (brighter margin)

    run_d = _arc_margin(dark, K)
    run_b = _arc_margin(bright, K)
    score = jnp.maximum(run_d, run_b)

    if n == 16:
        detect = score
    else:
        detect = jnp.maximum(jnp.minimum(run_d, _quick_margin(dark)),
                             jnp.minimum(run_b, _quick_margin(bright)))

    interior = _border_mask(img.shape)
    zero = jnp.zeros_like(score)
    return jnp.where(interior, detect, zero), jnp.where(interior, score, zero)


def fast_score_map(img, fast_type: str = "9_16"):
    """Pure segment-test margin map (= cv2 FAST response + 1)."""
    return fast_margins(img, fast_type)[1]


def nms_cv2(score):
    """OpenCV FAST non-max suppression on a sparse score map.

    `score` holds the corner response at detected corners and 0
    elsewhere.  A corner survives iff its score is STRICTLY greater than
    all 8 neighbours' values — equal-score neighbours annihilate each
    other, exactly like cv2's row-buffer comparison."""
    score = jnp.asarray(score, jnp.float32)
    view = shift_views(score, 1)
    neigh_max = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            v = view(dy, dx)
            neigh_max = v if neigh_max is None else jnp.maximum(neigh_max, v)
    # edge-padded views replicate the border pixel itself, which would
    # self-suppress; border scores are already 0 so clamp is harmless.
    return jnp.where(score > neigh_max, score, 0.0)


def nms3x3(score):
    """3×3 NMS with deterministic tie-break (first index wins).

    NOT cv2 semantics (cv2 lets ties annihilate, see `nms_cv2`) — kept
    for callers that need exactly-one-survivor-per-plateau behaviour.
    """
    score = jnp.asarray(score)
    H, W = score.shape[-2:]
    q = jnp.round(jnp.asarray(score, jnp.float32) * 4.0).astype(jnp.int32)
    idx = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
           + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1))
    # higher score wins; equal score -> smaller index wins.  The index is
    # wrapped to 20 bits: within any 3×3 window indices differ by <= W+1,
    # so pairwise comparisons stay consistent.
    comp = q * (1 << 20) + ((1 << 20) - 1 - (idx & 0xFFFFF))
    view = shift_views(comp, 1)
    neigh_max = jnp.full_like(comp, jnp.iinfo(jnp.int32).min)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neigh_max = jnp.maximum(neigh_max, view(dy, dx))
    keep = comp > neigh_max
    return jnp.where(keep, score, 0.0)


def detect_dense(img, threshold, fast_type: str = "9_16", nms: bool = True,
                 *, backend: str = "auto"):
    """cv2-exact FAST: returns the response map of surviving corners
    (score where corner else 0); corners = map > 0.

    `threshold` may be a scalar or a per-pixel map (the adaptive grid
    controller passes a per-cell threshold image).  On TPU the whole
    margins + threshold + sparse-NMS chain runs as ONE fused Pallas
    kernel (bit-identical; one HBM round-trip instead of XLA's many
    stencil passes).
    """
    img_a = jnp.asarray(img)
    if (backend == "auto" and img_a.ndim <= 3
            and jax.default_backend() == "tpu"
            and not _is_batch_tracer(img_a)
            and not _is_batch_tracer(jnp.asarray(threshold))):
        from front_end_tpu.ops.pallas import fast_kernel
        return fast_kernel.fast_detect_pallas(img_a, threshold, fast_type,
                                              nms)
    detect, score = fast_margins(img, fast_type, backend=backend)
    t = jnp.asarray(threshold, jnp.float32)
    s = jnp.where(detect > t, score, 0.0)
    if nms:
        s = nms_cv2(s)
    return s
