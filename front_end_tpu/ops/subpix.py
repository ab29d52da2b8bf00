"""Subpixel corner refinement — batched `cv::cornerSubPix`.

The reference refines every FAST detection one keypoint at a time
(`/root/reference/src/live_stereo.cpp:321-337`, winSize 5×5 → 11×11
window, zeroZone off, 40 iterations / 1e-3 eps).  Here all N keypoints are
refined together: one patch-gather of the gradient products, then a fixed
`lax.scan` of vmapped 2×2 solves — the per-keypoint "tiny solve" problem
called out in SURVEY §7 (hard part iv), batched instead of looped.

Algorithm (identical math to OpenCV): at the true corner q, for every
window pixel p,  ∇I(p)·(q − p) = 0 weighted by a Gaussian; accumulate
A = Σ w ∇I∇Iᵀ and b = Σ w (∇I∇Iᵀ)·p, solve q = A⁻¹ b, recentre, repeat.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from front_end_tpu.ops import image as image_ops


def corner_subpix(img, xy, valid=None, *, win: int = 5, iters: int = 5,
                  eps: float = 1e-3):
    """Refine (N, 2) keypoint coords on one (H, W) image.

    win=5 gives an 11×11 search window like the reference.  Movement is
    clamped to the window; invalid rows pass through unchanged.
    """
    img = jnp.asarray(img, jnp.float32)
    xy = jnp.asarray(xy, jnp.float32)
    H, W = img.shape
    side = 2 * win + 1
    # patch slightly larger than the window so gradients at window edge
    # are available after bilinear sampling
    psize = side + 4

    # Gaussian-ish weight mask (OpenCV uses exp(-(r/win)^2) style weights)
    gy, gx = np.mgrid[-win:win + 1, -win:win + 1].astype(np.float32)
    wmask = jnp.asarray(np.exp(-(gx**2 + gy**2) / (win * win)))

    gxk = jnp.asarray(gx)
    gyk = jnp.asarray(gy)

    def step(q, _):
        # sample gradients on the window centred at current estimate
        px = q[:, 0:1] + gxk.reshape(1, -1)               # (N, side^2)
        py = q[:, 1:2] + gyk.reshape(1, -1)
        pts = jnp.stack([px, py], -1).reshape(-1, 2)
        # central-difference gradients via 4 bilinear samples
        ix = (image_ops.bilinear_sample(img, pts + jnp.array([0.5, 0.0]))
              - image_ops.bilinear_sample(img, pts - jnp.array([0.5, 0.0])))
        iy = (image_ops.bilinear_sample(img, pts + jnp.array([0.0, 0.5]))
              - image_ops.bilinear_sample(img, pts - jnp.array([0.0, 0.5])))
        n = q.shape[0]
        ix = ix.reshape(n, -1)
        iy = iy.reshape(n, -1)
        w = wmask.reshape(1, -1)
        gxx = jnp.sum(w * ix * ix, -1)
        gxy = jnp.sum(w * ix * iy, -1)
        gyy = jnp.sum(w * iy * iy, -1)
        dx = gxk.reshape(1, -1)
        dy = gyk.reshape(1, -1)
        bx = jnp.sum(w * (ix * ix * dx + ix * iy * dy), -1)
        by = jnp.sum(w * (ix * iy * dx + iy * iy * dy), -1)
        det = gxx * gyy - gxy * gxy
        ok = jnp.abs(det) > 1e-9
        det = jnp.where(ok, det, 1.0)
        sx = (gyy * bx - gxy * by) / det
        sy = (gxx * by - gxy * bx) / det
        shift = jnp.stack([sx, sy], -1)
        shift = jnp.where(ok[:, None], shift, 0.0)
        shift = jnp.clip(shift, -float(win), float(win))
        return q + shift, jnp.max(jnp.abs(shift))

    q0 = xy
    q, _ = jax.lax.scan(step, q0, None, length=iters)
    # keep refinements inside the image and within the window of the seed
    q = jnp.clip(q, 0.0, jnp.array([W - 1.0, H - 1.0]))
    moved = jnp.linalg.norm(q - xy, axis=-1)
    q = jnp.where((moved <= win * 1.5)[:, None], q, xy)
    if valid is not None:
        q = jnp.where(jnp.asarray(valid)[:, None], q, xy)
    return q
