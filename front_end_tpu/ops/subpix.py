"""Subpixel corner refinement — batched `cv::cornerSubPix`.

The reference refines every FAST detection one keypoint at a time
(`/root/reference/src/live_stereo.cpp:321-337`, winSize 5×5 → 11×11
window, zeroZone off, 40 iterations / 1e-3 eps).

Algorithm (identical math to OpenCV): at the true corner q, for every
window pixel p,  ∇I(p)·(q − p) = 0 weighted by a Gaussian; accumulate
A = Σ w ∇I∇Iᵀ and b = Σ w (∇I∇Iᵀ)·p, solve q = A⁻¹ b, recentre, repeat.

TPU-native formulation: the windowed sums are CONVOLUTIONS of dense
gradient-product maps with the (separable) Gaussian weight —
  A(q) = (G ⊛ [gx², gxgy, gy²])(q)
  b(q) = (G ⊛ [gx²·X + gxgy·Y,  gxgy·X + gy²·Y])(q)
so the whole refinement is 5 dense separable filters built ONCE plus 5
bilinear samples per keypoint per iteration.  The previous per-keypoint
window-gather formulation issued 484 serialized gathers per keypoint
per iteration (~150 ms for 2304 keypoints on the v5e); this one costs
~4 ms — the per-keypoint tiny-solve problem of SURVEY §7 (hard part iv)
turned into stencils + a handful of samples.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from front_end_tpu.ops import image as image_ops


def corner_subpix(img, xy, valid=None, *, win: int = 5, iters: int = 5,
                  eps: float = 1e-3, max_shift: float | None = None):
    """Refine (N, 2) keypoint coords on one (H, W) image.

    win=5 gives an 11×11 search window like the reference.  Movement is
    clamped to the window; invalid rows pass through unchanged.

    max_shift: optional cap on the TOTAL refinement distance (px).
    cv2 allows drift up to the window size (and reverts beyond it),
    which on blob-textured scenes lets the gradient-crossing model pull
    detections toward nearby edges by several px — measured on the
    rendered-world regression this corrupts stereo geometry (ATE 10x
    worse).  Diagnosed r5 (`test_rendered_world.py::
    test_subpix_paradox_cv2_drifts_identically`): cv2's OWN cornerSubPix
    drifts identically on that texture (median 1.45 px, 56% of points
    >1 px; cv2's own VO gets ~21% worse ATE through it), while in the
    genuine sub-pixel regime this implementation matches cv2 to
    ~0.03 px — so the cap is the correct policy for non-corner-like
    texture, not a workaround for a solver bug.  A sub-pixel cap (e.g.
    0.75) keeps the refinement in the regime the operation is named
    for; the VO pipeline uses that (`pipeline/vo.py`).
    """
    img = jnp.asarray(img, jnp.float32)
    xy = jnp.asarray(xy, jnp.float32)
    H, W = img.shape

    # dense central-difference gradients (one shared padded buffer)
    v = image_ops.shift_views(img, 1, 1)
    gx = 0.5 * (v(0, 1) - v(0, -1))
    gy = 0.5 * (v(1, 0) - v(-1, 0))

    X = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    Y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    mxx, mxy, myy = gx * gx, gx * gy, gy * gy
    px = mxx * X + mxy * Y
    py = mxy * X + myy * Y

    # separable Gaussian-ish window weight (OpenCV's exp(-(r/win)^2))
    t = np.arange(-win, win + 1, dtype=np.float32)
    k = np.exp(-(t * t) / (win * win)).astype(np.float32)
    maps = jnp.stack([image_ops._sep_conv(m, k, k)
                      for m in (mxx, mxy, myy, px, py)])   # (5, H, W)

    def sample5(pts):
        """Bilinear sample all 5 maps at (N,2) pts with shared weights."""
        x = jnp.clip(pts[:, 0], 0.0, W - 1.001)
        y = jnp.clip(pts[:, 1], 0.0, H - 1.001)
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx, fy = x - x0, y - y0
        flat = maps.reshape(5, -1)
        i00 = y0 * W + x0
        v00 = flat[:, i00]
        v01 = flat[:, i00 + 1]
        v10 = flat[:, i00 + W]
        v11 = flat[:, i00 + W + 1]
        return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
                + fy * ((1 - fx) * v10 + fx * v11))        # (5, N)

    def step(q, _):
        sxx, sxy, syy, sbx, sby = sample5(q)
        det = sxx * syy - sxy * sxy
        ok = jnp.abs(det) > 1e-9
        det = jnp.where(ok, det, 1.0)
        nx = (syy * sbx - sxy * sby) / det
        ny = (sxx * sby - sxy * sbx) / det
        qn = jnp.stack([nx, ny], -1)
        shift = jnp.where(ok[:, None], qn - q, 0.0)
        shift = jnp.clip(shift, -float(win), float(win))
        return q + shift, None

    q, _ = jax.lax.scan(step, xy, None, length=iters)
    # keep refinements inside the image and within the window of the seed
    q = jnp.clip(q, 0.0, jnp.array([W - 1.0, H - 1.0]))
    moved = jnp.linalg.norm(q - xy, axis=-1)
    q = jnp.where((moved <= win * 1.5)[:, None], q, xy)
    if max_shift is not None:
        d = q - xy
        n = jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
        q = xy + d * jnp.minimum(1.0, max_shift / n)
    if valid is not None:
        q = jnp.where(jnp.asarray(valid)[:, None], q, xy)
    return q
