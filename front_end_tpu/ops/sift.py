"""SIFT — DoG pyramid detector + 128-d gradient-histogram descriptor.

Rebuild of the reference's vendored OpenCV SIFT
(`/root/reference/src/sift.cpp`): Gaussian pyramid
(`sift.cpp:199-237 buildGaussianPyramid`), DoG differences
(`:239-256`), 3×3×3 scale-space extrema with contrast and edge-ratio
rejection (`:437-521 findScaleSpaceExtrema`, `adjustLocalExtrema`
:331-435), 36-bin orientation histogram (`:258-329 calcOrientationHist`),
and the 4×4×8 descriptor (`:523-706 calcSIFTDescriptor`).

TPU shape: per octave the pyramid/DoG/extrema stages are dense stencils;
keypoints are top-K per octave and merged into one static set; the
descriptor is a batched gather over σ-scaled rotated grids.

Documented deviations (TPU static-shape driven):
- subpixel refinement is a 2D in-layer quadratic fit (scale offset not
  interpolated);
- one orientation per keypoint (OpenCV may emit secondary-peak clones);
- descriptor histogram uses Gaussian-weighted nearest-bin voting for the
  spatial cells with linear interpolation over orientation bins.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from front_end_tpu.ops.image import (bilinear_sample, gaussian_blur,
                                     shift2d)
from front_end_tpu.types import Descriptors, Keypoints

N_SPLITS = 3            # layers per octave (OpenCV nOctaveLayers)
SIGMA0 = 1.6
CONTRAST_THR = 0.04     # on [0,1] scale, like OpenCV's contrastThreshold
EDGE_THR = 10.0


def build_pyramid(img, n_octaves: int, n_layers: int = N_SPLITS,
                  sigma0: float = SIGMA0):
    """List (per octave) of (n_layers+3, h_o, w_o) Gaussian stacks."""
    img = jnp.asarray(img, jnp.float32) / 255.0
    k = 2.0 ** (1.0 / n_layers)
    # absolute sigmas within an octave
    sigmas = [sigma0 * (k ** i) for i in range(n_layers + 3)]
    octaves = []
    base = gaussian_blur(img, sigma0)
    for o in range(n_octaves):
        stack = [base]
        for i in range(1, n_layers + 3):
            inc = np.sqrt(max(sigmas[i] ** 2 - sigmas[i - 1] ** 2, 1e-6))
            stack.append(gaussian_blur(stack[-1], float(inc)))
        octaves.append(jnp.stack(stack))
        # next octave base: layer n_layers downsampled 2x
        base = stack[n_layers][::2, ::2]
    return octaves


def dog_stack(gauss):
    """(L+3, h, w) -> (L+2, h, w) difference-of-Gaussians."""
    return gauss[1:] - gauss[:-1]


class SiftDetections(NamedTuple):
    keypoints: Keypoints
    sigma: jnp.ndarray       # (K,) absolute scale at base resolution
    octave: jnp.ndarray      # (K,) int32


def _extrema_one_octave(dog, k_per_layer: int, contrast_thr: float):
    """Scale-space extrema in one octave's (L+2, h, w) DoG stack."""
    L = dog.shape[0] - 2
    h, w = dog.shape[1:]
    outs = []
    for j in range(1, L + 1):
        mid = dog[j]
        lo, hi = dog[j - 1], dog[j + 1]
        mx = jnp.full_like(mid, -jnp.inf)
        mn = jnp.full_like(mid, jnp.inf)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                for layer in (lo, mid, hi):
                    if layer is mid and dx == 0 and dy == 0:
                        continue
                    s = shift2d(layer, dy, dx)
                    mx = jnp.maximum(mx, s)
                    mn = jnp.minimum(mn, s)
        is_ext = ((mid > mx) & (mid > contrast_thr)) | \
                 ((mid < mn) & (mid < -contrast_thr))
        # edge rejection: 2x2 Hessian ratio (sift.cpp:382-396)
        dxx = shift2d(mid, 0, 1) + shift2d(mid, 0, -1) - 2 * mid
        dyy = shift2d(mid, 1, 0) + shift2d(mid, -1, 0) - 2 * mid
        dxy = 0.25 * (shift2d(mid, 1, 1) + shift2d(mid, -1, -1)
                      - shift2d(mid, 1, -1) - shift2d(mid, -1, 1))
        tr = dxx + dyy
        det = dxx * dyy - dxy * dxy
        r = EDGE_THR
        ok_edge = (det > 0) & (tr * tr * r < (r + 1) ** 2 * det)
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        interior = (ys >= 5) & (ys < h - 5) & (xs >= 5) & (xs < w - 5)
        score = jnp.where(is_ext & ok_edge & interior, jnp.abs(mid), 0.0)

        # subpixel: 2D quadratic offset within the layer
        gx = 0.5 * (shift2d(mid, 0, 1) - shift2d(mid, 0, -1))
        gy = 0.5 * (shift2d(mid, 1, 0) - shift2d(mid, -1, 0))
        den = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
        offx = jnp.clip(-(dyy * gx - dxy * gy) / den, -0.5, 0.5)
        offy = jnp.clip(-(dxx * gy - dxy * gx) / den, -0.5, 0.5)

        v, idx = jax.lax.top_k(score.reshape(-1), k_per_layer)
        yy = (idx // w).astype(jnp.float32) + offy.reshape(-1)[idx]
        xx = (idx % w).astype(jnp.float32) + offx.reshape(-1)[idx]
        outs.append((xx, yy, v, j))
    return outs


def detect(img, *, n_octaves: int = 3, n_layers: int = N_SPLITS,
           contrast_threshold: float = CONTRAST_THR,
           max_keypoints: int = 1024) -> SiftDetections:
    img = jnp.asarray(img, jnp.float32)
    pyr = build_pyramid(img, n_octaves, n_layers)
    k = 2.0 ** (1.0 / n_layers)

    # cv2 semantics (sift.cpp findScaleSpaceExtrema): the DoG contrast
    # test uses contrastThreshold / nOctaveLayers, NOT the raw value —
    # applying 0.04 directly was 3x stricter than cv2.SIFT default and
    # starved detection on low-contrast scenes (r5 family-parity oracle)
    dog_thr = contrast_threshold / n_layers
    per = max(16, max_keypoints // (n_octaves * n_layers))
    xs_l, ys_l, sc_l, sg_l, oc_l = [], [], [], [], []
    for o, gauss in enumerate(pyr):
        dog = dog_stack(gauss)
        for (xx, yy, v, j) in _extrema_one_octave(dog, per, dog_thr):
            scale = float(1 << o)
            xs_l.append(xx * scale)
            ys_l.append(yy * scale)
            sc_l.append(v)
            sg_l.append(jnp.full((per,), SIGMA0 * (k ** j) * scale))
            oc_l.append(jnp.full((per,), o, jnp.int32))
    xs = jnp.concatenate(xs_l)
    ys = jnp.concatenate(ys_l)
    sc = jnp.concatenate(sc_l)
    sg = jnp.concatenate(sg_l)
    oc = jnp.concatenate(oc_l)
    if sc.shape[0] < max_keypoints:
        # small images: the per-octave candidate pool can undershoot the
        # requested capacity (e.g. 1017 < 1024 at 256x192) — pad with
        # invalid rows so the output capacity stays static
        pad = max_keypoints - sc.shape[0]
        xs = jnp.pad(xs, (0, pad))
        ys = jnp.pad(ys, (0, pad))
        sc = jnp.pad(sc, (0, pad), constant_values=-1.0)
        sg = jnp.pad(sg, (0, pad), constant_values=1.0)
        oc = jnp.pad(oc, (0, pad))
    v, sel = jax.lax.top_k(jnp.where(sc > 0, sc, -1.0), max_keypoints)
    kps = Keypoints(xy=jnp.stack([xs[sel], ys[sel]], -1), score=v,
                    angle=jnp.zeros((max_keypoints,)), valid=v > 0)
    return SiftDetections(keypoints=kps, sigma=sg[sel], octave=oc[sel])


def _grad(img):
    gx = 0.5 * (shift2d(img, 0, 1) - shift2d(img, 0, -1))
    gy = 0.5 * (shift2d(img, 1, 0) - shift2d(img, -1, 0))
    return gx, gy


def orientations(img, xy, sigma, valid):
    """Dominant gradient orientation, 36-bin histogram with Gaussian
    weighting (sift.cpp:258-329)."""
    img = jnp.asarray(img, jnp.float32)
    gx, gy = _grad(img)
    # sample square grid of radius 4 (in units of 1.5*sigma/4)
    R = 4
    offs = np.mgrid[-R:R + 1, -R:R + 1].reshape(2, -1).T.astype(np.float32)
    w_g = np.exp(-(offs**2).sum(1) / (2 * (0.5 * R) ** 2)).astype(np.float32)
    offs_j = jnp.asarray(offs)
    wj = jnp.asarray(w_g)

    step = (1.5 * jnp.asarray(sigma) / R)[:, None]             # (N,1)
    px = xy[:, 0:1] + offs_j[None, :, 1] * step                # (N,P)
    py = xy[:, 1:2] + offs_j[None, :, 0] * step
    pts = jnp.stack([px, py], -1).reshape(-1, 2)
    sgx = bilinear_sample(gx, pts).reshape(px.shape)
    sgy = bilinear_sample(gy, pts).reshape(px.shape)
    mag = jnp.sqrt(sgx**2 + sgy**2) * wj[None]
    ang = jnp.arctan2(sgy, sgx)                                # (N,P)
    nbins = 36
    bin_f = (ang + jnp.pi) / (2 * jnp.pi) * nbins
    b0 = jnp.floor(bin_f).astype(jnp.int32) % nbins
    hist = jnp.zeros((xy.shape[0], nbins))
    hist = hist.at[jnp.arange(xy.shape[0])[:, None], b0].add(mag)
    # smooth histogram circularly
    hist = (jnp.roll(hist, 1, -1) + hist + jnp.roll(hist, -1, -1)) / 3.0
    peak = jnp.argmax(hist, -1)
    angle = (peak.astype(jnp.float32) + 0.5) / nbins * 2 * jnp.pi - jnp.pi
    return jnp.where(jnp.asarray(valid), angle, 0.0)


def describe(img, xy, sigma, angle, *, n_spatial: int = 4,
             n_orient: int = 8) -> Descriptors:
    """4×4×8 = 128-d descriptor (sift.cpp:523-706), L2-normalized with
    0.2 clipping and renormalization."""
    img = jnp.asarray(img, jnp.float32)
    gx, gy = _grad(img)
    xy = jnp.asarray(xy)
    n = xy.shape[0]

    S = 4 * n_spatial                                  # 16x16 samples
    offs = (np.mgrid[0:S, 0:S].reshape(2, -1).T.astype(np.float32)
            - (S - 1) / 2.0)                           # (P,2) [dy,dx]
    cell = (np.floor((offs + S / 2) / n_spatial).astype(np.int32))
    cell_id = cell[:, 1] * n_spatial + cell[:, 0]      # (P,) 0..15
    w_g = np.exp(-(offs**2).sum(1) / (2 * (0.5 * S) ** 2)).astype(np.float32)
    offs_j = jnp.asarray(offs)
    wj = jnp.asarray(w_g)
    onehot = jnp.asarray(np.eye(n_spatial * n_spatial,
                                dtype=np.float32)[cell_id])   # (P,16)

    ca, sa = jnp.cos(angle), jnp.sin(angle)
    step = (jnp.asarray(sigma) * 3.0 / n_spatial / 2.0)[:, None]
    rx = (offs_j[None, :, 1] * ca[:, None]
          - offs_j[None, :, 0] * sa[:, None]) * step
    ry = (offs_j[None, :, 1] * sa[:, None]
          + offs_j[None, :, 0] * ca[:, None]) * step
    px = xy[:, 0:1] + rx
    py = xy[:, 1:2] + ry
    pts = jnp.stack([px, py], -1).reshape(-1, 2)
    sgx = bilinear_sample(gx, pts).reshape(n, -1)
    sgy = bilinear_sample(gy, pts).reshape(n, -1)
    # rotate gradients into keypoint frame
    rgx = sgx * ca[:, None] + sgy * sa[:, None]
    rgy = -sgx * sa[:, None] + sgy * ca[:, None]
    mag = jnp.sqrt(rgx**2 + rgy**2) * wj[None]
    ang = jnp.arctan2(rgy, rgx)                         # (N,P)

    bin_f = (ang + jnp.pi) / (2 * jnp.pi) * n_orient
    b0 = jnp.floor(bin_f).astype(jnp.int32) % n_orient
    b1 = (b0 + 1) % n_orient
    f = bin_f - jnp.floor(bin_f)
    # orientation-linear, cell-pooled histograms via one matmul per bin
    oh_b0 = jax.nn.one_hot(b0, n_orient) * (mag * (1 - f))[..., None]
    oh_b1 = jax.nn.one_hot(b1, n_orient) * (mag * f)[..., None]
    votes = oh_b0 + oh_b1                               # (N,P,8)
    desc = jnp.einsum("npo,pc->nco", votes, onehot)     # (N,16,8)
    vec = desc.reshape(n, -1)
    vec = vec / jnp.maximum(
        jnp.linalg.norm(vec, axis=-1, keepdims=True), 1e-9)
    vec = jnp.minimum(vec, 0.2)
    vec = vec / jnp.maximum(
        jnp.linalg.norm(vec, axis=-1, keepdims=True), 1e-9)
    return Descriptors(bits=vec)


def detect_and_describe(img, *, n_octaves: int = 3,
                        max_keypoints: int = 1024,
                        contrast_threshold: float = CONTRAST_THR):
    det = detect(img, n_octaves=n_octaves, max_keypoints=max_keypoints,
                 contrast_threshold=contrast_threshold)
    kps = det.keypoints
    ang = orientations(img, kps.xy, det.sigma, kps.valid)
    desc = describe(img, kps.xy, det.sigma, ang)
    return det._replace(keypoints=kps.replace(angle=ang)), desc
