"""BRIEF binary descriptors, batched over keypoints.

Rebuild of `cv::BriefDescriptorExtractor` as used by the reference's live
pipelines (`/root/reference/src/live_stereo.cpp:238,359-360` BRIEF-16;
`bin/detect_node:24-54` swaps BRIEF-16/64; `features.py:703-778`).
"Bytes" follows the OpenCV parameter (16/32/64 bytes = 128/256/512 bits).

TPU shape: the image is box-smoothed ONCE densely (9×9, as OpenCV's
integral-image smoothing), then each bit is a comparison of two gathered
samples — a (N, nbits, 2) gather and a single vectorized compare.  Bits
are produced in the MXU-friendly {0,1} float layout (`types.Descriptors`);
packing to uint32 is a utility for storage/tests.

The test pattern is a fixed isotropic-Gaussian pair set (BRIEF paper G II
sampling, sigma = patch/5) generated from a deterministic seed — OpenCV
bit-for-bit parity is NOT a goal (its pattern is a baked table); what is
preserved is descriptor length, Hamming metric and matching behavior.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from front_end_tpu.ops import image as image_ops
from front_end_tpu.types import Descriptors

PATCH = 48            # sampling window (OpenCV BRIEF: 48+9 borders)
SMOOTH = 9            # box smoothing size


@functools.lru_cache(maxsize=None)
def _brief_pattern_np(n_bits: int, patch: int, seed: int):
    rs = np.random.RandomState(seed)
    sigma = patch / 5.0
    pts = rs.normal(0.0, sigma, size=(n_bits, 2, 2))
    return np.clip(np.round(pts), -(patch // 2 - 1),
                   patch // 2 - 1).astype(np.int32)


def brief_pattern(n_bits: int, patch: int = PATCH, seed: int = 7):
    """(n_bits, 2, 2) int32 offsets [(dxA,dyA),(dxB,dyB)], clipped.

    Only the numpy table is cached — converting to a jnp array at the call
    site keeps jit traces from leaking tracers into the cache."""
    return jnp.asarray(_brief_pattern_np(n_bits, patch, seed))


def smooth(img):
    return image_ops.box_blur(jnp.asarray(img, jnp.float32), SMOOTH)


def describe(img_smooth, xy, n_bytes: int = 16, *, pattern_seed: int = 7
             ) -> Descriptors:
    """Descriptors for (N,2) keypoints on a pre-smoothed (H,W) image.

    Pass the same `img_smooth` (from :func:`smooth`) for many keypoint
    sets to amortize the dense blur.
    """
    n_bits = 8 * n_bytes
    pat = brief_pattern(n_bits)                        # (n_bits, 2, 2)
    H, W = img_smooth.shape[-2:]
    c = jnp.round(jnp.asarray(xy)).astype(jnp.int32)   # (N, 2) x,y

    pos = c[:, None, None, :] + pat[None]              # (N, n_bits, 2, 2)
    px = jnp.clip(pos[..., 0], 0, W - 1)
    py = jnp.clip(pos[..., 1], 0, H - 1)
    flat = img_smooth.reshape(-1)
    vals = flat[py * W + px]                           # (N, n_bits, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.float32)
    return Descriptors(bits=bits)


def describe_dense(img_smooth, xy, n_bytes: int = 16, *,
                   pattern_seed: int = 7) -> Descriptors:
    """Dense-bitplane BRIEF — the TPU fast path.

    Per-keypoint random gathers are the slowest primitive on TPU (the
    gather-based :func:`describe` costs ~10 ns/sample); instead each of
    the n_bits comparisons is evaluated DENSELY for every pixel as a
    shifted-image compare (pure VPU, fused by XLA), packed on the fly
    into uint32 bitplane words, and only n_bits/32 words are gathered per
    keypoint — a ~64× reduction in gather traffic.

    Bit-for-bit identical to :func:`describe` away from the image border
    (dense shifts use edge padding; `valid_mask` excludes the border).
    Returns both the packed words and the unpacked MXU matching layout.

    The image is padded ONCE and every comparison is a static slice of
    that one buffer: XLA fuses slices (unlike per-shift pads) into the
    bit-accumulate loop, cutting HBM traffic by the pattern size
    (measured vs the shift2d form in bench_brief.py).
    """
    from front_end_tpu.ops.image import shift_views
    from front_end_tpu.types import unpack_bits

    n_bits = 8 * n_bytes
    pat = _brief_pattern_np(n_bits, PATCH, pattern_seed)   # numpy
    img = jnp.asarray(img_smooth)
    H, W = img.shape[-2:]
    view = shift_views(img, PATCH // 2)

    words = []
    for w in range(n_bits // 32):
        acc = None
        for j in range(32):
            (axo, ayo), (bxo, byo) = pat[w * 32 + j]
            cmp = view(int(ayo), int(axo)) < view(int(byo), int(bxo))
            term = cmp.astype(jnp.uint32) << jnp.uint32(j)
            acc = term if acc is None else acc | term
        words.append(acc)
    planes = jnp.stack(words, -1)                          # (H, W, n_words)

    c = jnp.round(jnp.asarray(xy)).astype(jnp.int32)
    px = jnp.clip(c[:, 0], 0, W - 1)
    py = jnp.clip(c[:, 1], 0, H - 1)
    packed = planes.reshape(-1, n_bits // 32)[py * W + px]  # (N, n_words)
    return Descriptors(bits=unpack_bits(packed), packed=packed)


def valid_mask(xy, width: int, height: int, border: int = PATCH // 2 + SMOOTH):
    """Keypoints too close to the border can't be described (OpenCV drops
    them; we mask them)."""
    xy = jnp.asarray(xy)
    return ((xy[:, 0] >= border) & (xy[:, 0] < width - border)
            & (xy[:, 1] >= border) & (xy[:, 1] < height - border))
