"""Dense image primitives: blur, gradients, integral image, patch gather.

These are the building blocks under every detector/descriptor; all are
batched dense ops that XLA maps onto the VPU (stencils) or MXU (separable
convolutions expressed as matmuls for large kernels).

Convention: images are (..., H, W) float32 in [0, 255] (grayscale); `xy`
keypoint coordinates are (x=col, y=row) like OpenCV.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def to_gray(rgb):
    """(..., H, W, 3) uint8/float -> (..., H, W) float32, ITU-R BT.601."""
    rgb = jnp.asarray(rgb).astype(jnp.float32)
    return (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])


def shift_views(img, ry: int, rx: int | None = None):
    """Pad ONCE by (ry, rx) edge pixels; return `view(dy, dx)` producing
    out[y, x] = img[clamp(y+dy), clamp(x+dx)] as a pure static slice of
    the one shared padded buffer.

    This is the load-bearing fusion trick of the dense stencil layer:
    `shift2d` pads per call, and XLA materializes every padded copy (a
    16-point FAST stencil or a 512-comparison BRIEF plane each turn into
    hundreds of full-image HBM round-trips).  Slices of one buffer fuse
    into a single VPU loop — measured 10-40x less HBM traffic on the
    376x1241 VO hot path.
    """
    if rx is None:
        rx = ry
    img = jnp.asarray(img)
    H, W = img.shape[-2:]
    lead = img.ndim - 2
    p = jnp.pad(img, [(0, 0)] * lead + [(ry, ry), (rx, rx)], mode="edge")

    def view(dy: int, dx: int):
        starts = (0,) * lead + (ry + dy, rx + dx)
        limits = tuple(p.shape[:lead]) + (ry + dy + H, rx + dx + W)
        return jax.lax.slice(p, starts, limits)

    return view


def _sep_conv(img, kx, ky):
    """Separable 2D correlation with edge padding, (..., H, W).

    Expressed as shift-and-accumulate over pad-once views so XLA fuses
    each pass into one VPU loop; kernels here are small (3-13 taps)."""
    img = jnp.asarray(img, jnp.float32)
    rx, ry = len(kx) // 2, len(ky) // 2
    vx = shift_views(img, 0, rx)
    out = sum(float(kx[i]) * vx(0, i - rx) for i in range(len(kx)))
    vy = shift_views(out, ry, 0)
    out = sum(float(ky[j]) * vy(j - ry, 0) for j in range(len(ky)))
    return out


def gaussian_kernel(sigma: float, radius: int | None = None) -> np.ndarray:
    if radius is None:
        radius = max(1, int(3.0 * sigma + 0.5))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img, sigma: float, radius: int | None = None):
    k = gaussian_kernel(sigma, radius)
    return _sep_conv(img, k, k)


def _box1d(x, size: int, axis: int):
    """Sliding-window sum along `axis` with edge padding, via cumsum.

    Two O(n) passes regardless of window size — the separable shift-add
    form costs `size` passes and defeats XLA fusion through its pads."""
    r = size // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (r, size - 1 - r)
    p = jnp.pad(x, pad, mode="edge")
    c = jnp.cumsum(p, axis=axis)
    zpad = [(0, 0)] * x.ndim
    zpad[axis] = (1, 0)
    c = jnp.pad(c, zpad)
    n = x.shape[axis]
    hi = jax.lax.slice_in_dim(c, size, size + n, axis=axis)
    lo = jax.lax.slice_in_dim(c, 0, n, axis=axis)
    return hi - lo


def box_blur(img, size: int):
    """size×size mean filter (the BRIEF pre-smoothing; OpenCV uses 9×9)."""
    img = jnp.asarray(img, jnp.float32)
    s = _box1d(_box1d(img, size, img.ndim - 1), size, img.ndim - 2)
    return s * (1.0 / (size * size))


def sobel(img):
    """Returns (gx, gy), OpenCV Sobel 3x3 kernels."""
    gx = _sep_conv(img, np.array([-1.0, 0.0, 1.0], np.float32),
                   np.array([1.0, 2.0, 1.0], np.float32))
    gy = _sep_conv(img, np.array([1.0, 2.0, 1.0], np.float32),
                   np.array([-1.0, 0.0, 1.0], np.float32))
    return gx, gy


def integral_image(img):
    """Summed-area table with a leading zero row/col: (..., H+1, W+1).

    sum over [y0,y1)x[x0,x1) = ii[y1,x1]-ii[y0,x1]-ii[y1,x0]+ii[y0,x0].
    The associative cumsum maps to O(log n) XLA scans.
    """
    ii = jnp.cumsum(jnp.cumsum(jnp.asarray(img, jnp.float32), -1), -2)
    return jnp.pad(ii, [(0, 0)] * (ii.ndim - 2) + [(1, 0), (1, 0)])


def shift2d(img, dy: int, dx: int):
    """Static shift with edge padding: out[y, x] = img[y+dy, x+dx]."""
    H, W = img.shape[-2:]
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    p = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(py1, py0), (px1, px0)],
                mode="edge")
    return p[..., py0:py0 + H, px0:px0 + W]


def extract_patches(img, xy, patch: int):
    """Gather (P, P) patches centred at integer-rounded keypoints.

    img: (H, W); xy: (N, 2) float (x, y).  Returns (N, P, P) float32.
    Patches are clamped inside the image (coordinates near the border
    slide inward — callers mask border keypoints anyway).
    """
    H, W = img.shape[-2:]
    r = patch // 2
    cx = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32) - r, 0, W - patch)
    cy = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32) - r, 0, H - patch)

    def one(y0, x0):
        return jax.lax.dynamic_slice(img, (y0, x0), (patch, patch))

    return jax.vmap(one)(cy, cx)


def bilinear_sample(img, xy):
    """Bilinear interpolation of (H, W) image at (N, 2) float (x, y)."""
    H, W = img.shape[-2:]
    x = jnp.clip(xy[:, 0], 0.0, W - 1.001)
    y = jnp.clip(xy[:, 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx, fy = x - x0, y - y0
    flat = img.reshape(-1)

    def at(yy, xx):
        return flat[yy * W + xx]

    v00 = at(y0, x0)
    v01 = at(y0, x0 + 1)
    v10 = at(y0 + 1, x0)
    v11 = at(y0 + 1, x0 + 1)
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))
