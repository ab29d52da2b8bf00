"""SURF — Fast-Hessian detector + 64/128-d descriptor, TPU-dense.

One implementation replaces the reference's three
(`/root/reference/src/surf.cpp` CPU, `src/cuda/surf.cu` CUDA,
`src/opencl/surf.cl` OpenCL): the algorithm structure follows the same
stages — integral image, box-filter Hessian layers
(`surf.cpp:167-227 calcLayerDetAndTrace`), 3×3×3 scale-space maxima
(`surf.cpp:346-460 findMaximaInLayer`), quadratic subpixel interpolation
(`surf.cpp:229-259 interpolateKeypoint`), Haar-wavelet orientation and
4×4-subregion descriptor (`surf.cpp:515-889 SURFInvoker`) — but every
per-pixel loop is a dense batched stencil over shifted integral-image
slices, and per-keypoint work is batched over a fixed top-K keypoint set.

Deliberate deviations from OpenCV (documented, not accidental):
- layers are evaluated at FULL resolution for every octave (no
  sampleStep subsampling) — more accurate, and dense full-res stencils
  are cheaper on TPU than strided gathers;
- keypoint capacity is static (top-K by Hessian response).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from front_end_tpu.ops.image import integral_image
from front_end_tpu.types import Keypoints

def _box(ii, x0, y0, x1, y1):
    """Dense box sum over [y0, y1) x [x0, x1) windows centred per pixel.

    ii: (..., H+1, W+1) integral image.  Offsets are relative to the
    pixel; returns (..., H, W).  Out-of-image windows clamp to the edge
    (constant padding of the integral image keeps sums finite)."""
    H = ii.shape[-2] - 1
    W = ii.shape[-1] - 1

    def tap(dy, dx):
        ys = jnp.clip(jnp.arange(H) + dy, 0, H)
        xs = jnp.clip(jnp.arange(W) + dx, 0, W)
        return ii[..., ys, :][..., :, xs]

    return (tap(y1, x1) - tap(y0, x1) - tap(y1, x0) + tap(y0, x0))


def hessian_layer(ii, size: int):
    """det(H) and trace for one box-filter size (`surf.cpp:167-227`)."""
    l = size // 3                    # lobe
    half = size // 2
    w = 2 * l - 1                    # lateral width
    # Dyy: full (3l x w) box minus 3x middle (l x w) box
    x0, x1 = -(w // 2), w // 2 + 1
    dyy_full = _box(ii, x0, -half, x1, -half + 3 * l)
    dyy_mid = _box(ii, x0, -half + l, x1, -half + 2 * l)
    Dyy = dyy_full - 3.0 * dyy_mid
    # Dxx: transpose layout
    dxx_full = _box(ii, -half, x0, -half + 3 * l, x1)
    dxx_mid = _box(ii, -half + l, x0, -half + 2 * l, x1)
    Dxx = dxx_full - 3.0 * dxx_mid
    # Dxy: 4 diagonal l x l boxes
    Dxy = (_box(ii, -l, -l, 0, 0) + _box(ii, 1, 1, l + 1, l + 1)
           - _box(ii, 1, -l, l + 1, 0) - _box(ii, -l, 1, 0, l + 1))
    inv = 1.0 / (size * size)
    Dxx, Dyy, Dxy = Dxx * inv, Dyy * inv, Dxy * inv
    det = Dxx * Dyy - (0.9 * Dxy) ** 2
    trace = Dxx + Dyy
    return det, trace


class SurfDetections(NamedTuple):
    keypoints: Keypoints         # xy, score=det response, size in .size
    size: jnp.ndarray            # (K,) filter size per keypoint
    laplacian: jnp.ndarray       # (K,) sign of trace (matching hint,
                                 # surf.cpp:381 & gpu.hpp keypointsRatio)


def _gather9(layer, ys, xs, H, W):
    """3×3 neighborhood values at integer centres: (N, 3, 3)."""
    flat = layer.reshape(-1)
    dy = jnp.arange(-1, 2)
    dx = jnp.arange(-1, 2)
    yy = jnp.clip(ys[:, None, None] + dy[None, :, None], 0, H - 1)
    xx = jnp.clip(xs[:, None, None] + dx[None, None, :], 0, W - 1)
    return flat[yy * W + xx]


def interpolate_keypoints(d_lo, d_mid, d_hi, ys, xs, size, step):
    """Batched 3D quadratic keypoint interpolation — the
    `interpolateKeypoint` stage (`/root/reference/src/surf.cpp:229-259`):
    fit det(H) around each maximum over (x, y, scale), offset = −H⁻¹g,
    accept when every |offset| < 1 (OpenCV discards divergent fits).

    Returns (x_ref, y_ref, size_ref, ok) — all (N,) floats/bool.  `step`
    is the filter-size spacing between adjacent layers (the scale unit).
    """
    H, W = d_mid.shape
    v = jnp.stack([_gather9(d_lo, ys, xs, H, W),
                   _gather9(d_mid, ys, xs, H, W),
                   _gather9(d_hi, ys, xs, H, W)], 1)   # (N, 3s, 3y, 3x)

    gx = (v[:, 1, 1, 2] - v[:, 1, 1, 0]) * 0.5
    gy = (v[:, 1, 2, 1] - v[:, 1, 0, 1]) * 0.5
    gs = (v[:, 2, 1, 1] - v[:, 0, 1, 1]) * 0.5
    c = v[:, 1, 1, 1]
    dxx = v[:, 1, 1, 2] + v[:, 1, 1, 0] - 2 * c
    dyy = v[:, 1, 2, 1] + v[:, 1, 0, 1] - 2 * c
    dss = v[:, 2, 1, 1] + v[:, 0, 1, 1] - 2 * c
    dxy = (v[:, 1, 2, 2] - v[:, 1, 2, 0]
           - v[:, 1, 0, 2] + v[:, 1, 0, 0]) * 0.25
    dxs = (v[:, 2, 1, 2] - v[:, 2, 1, 0]
           - v[:, 0, 1, 2] + v[:, 0, 1, 0]) * 0.25
    dys = (v[:, 2, 2, 1] - v[:, 2, 0, 1]
           - v[:, 0, 2, 1] + v[:, 0, 0, 1]) * 0.25

    Hm = jnp.stack([jnp.stack([dxx, dxy, dxs], -1),
                    jnp.stack([dxy, dyy, dys], -1),
                    jnp.stack([dxs, dys, dss], -1)], -2)     # (N,3,3)
    g = jnp.stack([gx, gy, gs], -1)                          # (N,3)
    # damped solve keeps singular fits finite; they fail the |o|<1 gate
    eye = jnp.eye(3) * 1e-12
    off = -jnp.linalg.solve(Hm + eye, g[..., None])[..., 0]  # (N,3)
    finite = jnp.all(jnp.isfinite(off), -1)
    ok = finite & jnp.all(jnp.abs(off) < 1.0, -1)
    x_ref = xs.astype(jnp.float32) + jnp.where(ok, off[:, 0], 0.0)
    y_ref = ys.astype(jnp.float32) + jnp.where(ok, off[:, 1], 0.0)
    size_ref = size + jnp.where(ok, off[:, 2], 0.0) * step
    return x_ref, y_ref, size_ref, ok


def detect(img, *, hessian_threshold: float = 100.0, n_octaves: int = 3,
           n_octave_layers: int = 2, max_keypoints: int = 1024,
           subpix: bool = True) -> SurfDetections:
    """Fast-Hessian keypoints on one (H, W) image.

    n_octave_layers = middle layers per octave (OpenCV param); total
    layers computed = n_octave_layers + 2.
    """
    img = jnp.asarray(img, jnp.float32)
    H, W = img.shape
    ii = integral_image(img)

    # per octave: sizes with spacing 6*2^o; middle layers are maxima
    # candidates (surf.cpp:462-513 structure).  Layers shared between
    # octaves (e.g. 27) are computed once.
    all_det = {}

    def det_for(size):
        if size not in all_det:
            all_det[size] = hessian_layer(ii, size)
        return all_det[size]

    cand = []       # (det_mid, size_mid, det_lo, det_hi, trace_mid, step)
    for o in range(n_octaves):
        # classic SURF filter-size table: o=0: 9,15,21,27; o=1: 15,27,39,
        # 51; o=2: 27,51,75,99 — first = 3*(2^(o+1)+1), step = 6*2^o.
        step = 6 << o
        first = 3 * ((1 << (o + 1)) + 1)
        sizes = [first + step * k for k in range(n_octave_layers + 2)]
        for j in range(1, n_octave_layers + 1):
            d_lo, _ = det_for(sizes[j - 1])
            d_mid, t_mid = det_for(sizes[j])
            d_hi, _ = det_for(sizes[j + 1])
            cand.append((d_mid, sizes[j], d_lo, d_hi, t_mid, step))

    # 3x3x3 maxima per candidate layer
    from front_end_tpu.ops.image import shift2d

    kp_chunks = []
    for d_mid, size, d_lo, d_hi, t_mid, step in cand:
        neigh = jnp.full_like(d_mid, -jnp.inf)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                for layer in (d_lo, d_mid, d_hi):
                    if layer is d_mid and dy == 0 and dx == 0:
                        continue
                    neigh = jnp.maximum(neigh, shift2d(layer, dy, dx))
        margin = size // 2 + 1
        ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        interior = ((ys >= margin) & (ys < H - margin)
                    & (xs >= margin) & (xs < W - margin))
        is_max = (d_mid > hessian_threshold) & (d_mid > neigh) & interior
        score = jnp.where(is_max, d_mid, 0.0)
        kp_chunks.append((score, size, t_mid, d_lo, d_mid, d_hi, step))

    k_per_layer = max(max_keypoints // max(len(kp_chunks), 1), 16)
    xs_all, ys_all, sc_all, sz_all, lap_all = [], [], [], [], []
    for score, size, t_mid, d_lo, d_mid, d_hi, step in kp_chunks:
        v, idx = jax.lax.top_k(score.reshape(-1), k_per_layer)
        yy = idx // W
        xx = idx % W
        szf = jnp.full((k_per_layer,), size, jnp.float32)
        if subpix:
            # 3D quadratic refinement (surf.cpp:229-259); divergent fits
            # are discarded like OpenCV's interpolateKeypoint==false
            xr, yr, sr, ok = interpolate_keypoints(
                d_lo, d_mid, d_hi, yy, xx, szf, float(step))
            v = jnp.where(ok, v, 0.0)
            xs_all.append(xr)
            ys_all.append(yr)
            sz_all.append(sr)
        else:
            xs_all.append(xx.astype(jnp.float32))
            ys_all.append(yy.astype(jnp.float32))
            sz_all.append(szf)
        sc_all.append(v)
        lap_all.append(jnp.sign(t_mid.reshape(-1)[idx]))

    xs = jnp.concatenate(xs_all)
    ys = jnp.concatenate(ys_all)
    sc = jnp.concatenate(sc_all)
    sz = jnp.concatenate(sz_all)
    lap = jnp.concatenate(lap_all)
    valid = sc > 0

    # keep global top max_keypoints
    v, sel = jax.lax.top_k(jnp.where(valid, sc, -1.0), max_keypoints)
    kps = Keypoints(
        xy=jnp.stack([xs[sel], ys[sel]], -1).astype(jnp.float32),
        score=v, angle=jnp.zeros((max_keypoints,), jnp.float32),
        valid=v > 0)
    return SurfDetections(keypoints=kps, size=sz[sel], laplacian=lap[sel])


def detect_dense(img, *, hessian_threshold: float = 100.0,
                 n_octaves: int = 3, n_octave_layers: int = 2):
    """Score-map form for the sweep/services API: max det(H) over all
    middle layers, NMS'd; corners = map > 0."""
    det = detect(img, hessian_threshold=hessian_threshold,
                 n_octaves=n_octaves, n_octave_layers=n_octave_layers,
                 max_keypoints=1024, subpix=False)
    H, W = jnp.asarray(img).shape
    smap = jnp.zeros((H, W), jnp.float32)
    yy = det.keypoints.xy[:, 1].astype(jnp.int32)
    xx = det.keypoints.xy[:, 0].astype(jnp.int32)
    vals = jnp.where(det.keypoints.valid, det.keypoints.score, 0.0)
    return smap.at[yy, xx].max(vals)


# ---------------------------------------------------------------------------
# Descriptor (surf.cpp:515-889)
# ---------------------------------------------------------------------------

def _haar_xy(ii, px, py, s):
    """Haar wavelet responses (dx, dy) of size 2s at integer points.

    px, py: (...,) int32 sample centres; s: (...,) response half-size.
    Box sums via 4-tap integral lookups, batched."""
    H = ii.shape[-2] - 1
    W = ii.shape[-1] - 1
    iif = ii.reshape(-1)

    def at(yy, xx):
        yy = jnp.clip(yy, 0, H)
        xx = jnp.clip(xx, 0, W)
        return iif[yy * (W + 1) + xx]

    def box(x0, y0, x1, y1):
        return (at(y1, x1) - at(y0, x1) - at(y1, x0) + at(y0, x0))

    # dx: right box minus left box, each s wide, 2s tall
    dx = (box(px, py - s, px + s, py + s)
          - box(px - s, py - s, px, py + s))
    dy = (box(px - s, py, px + s, py + s)
          - box(px - s, py - s, px + s, py))
    return dx, dy


def orientations(img_ii, xy, size, valid):
    """Dominant orientation per keypoint (surf.cpp:570-650 capability):
    Haar responses on a radius-6s grid, 60-degree sliding-window vote."""
    s = jnp.maximum(jnp.round(1.2 * size / 9.0), 1.0)
    # sample grid: offsets in units of s within radius 6
    pts = [(i, j) for i in range(-5, 6) for j in range(-5, 6)
           if i * i + j * j <= 36]
    offs = jnp.asarray(np.array(pts, np.float32))            # (P, 2)
    gw = jnp.asarray(np.exp(-(np.array(pts)[:, 0]**2
                              + np.array(pts)[:, 1]**2) / (2 * 2.5**2))
                     .astype(np.float32))

    cx = xy[:, 0:1] + offs[None, :, 0] * s[:, None]
    cy = xy[:, 1:2] + offs[None, :, 1] * s[:, None]
    px = jnp.round(cx).astype(jnp.int32)
    py = jnp.round(cy).astype(jnp.int32)
    ss = jnp.round(2.0 * s)[:, None].astype(jnp.int32) * jnp.ones_like(px)
    dx, dy = _haar_xy(img_ii, px, py, ss)                    # (N, P)
    dx = dx * gw[None]
    dy = dy * gw[None]

    ang = jnp.arctan2(dy, dx)                                # (N, P)
    # 60-degree sliding windows at 10-degree steps
    best_mag = jnp.zeros(xy.shape[0])
    best_ang = jnp.zeros(xy.shape[0])
    for k in range(36):
        a0 = -jnp.pi + k * (jnp.pi / 18.0)
        diff = jnp.mod(ang - a0 + jnp.pi, 2 * jnp.pi) - jnp.pi
        inw = (diff >= 0) & (diff < jnp.pi / 3.0)
        sx = jnp.sum(jnp.where(inw, dx, 0.0), -1)
        sy = jnp.sum(jnp.where(inw, dy, 0.0), -1)
        mag = sx * sx + sy * sy
        upd = mag > best_mag
        best_mag = jnp.where(upd, mag, best_mag)
        best_ang = jnp.where(upd, jnp.arctan2(sy, sx), best_ang)
    return jnp.where(valid, best_ang, 0.0)


def _haar_maps(ii, hs: int):
    """Dense Haar-response maps dx(y, x), dy(y, x) for a CONSTANT
    half-size hs, from static shifted views of the integral image —
    exactly `_haar_xy` evaluated at every pixel, with zero gathers."""
    H = ii.shape[-2] - 1
    W = ii.shape[-1] - 1
    from front_end_tpu.ops.image import shift_views
    v = shift_views(ii, hs, hs)

    def at(dy, dx_):
        # ii[y + dy, x + dx_] for all (y, x) in [0,H)x[0,W): the view
        # grid spans ii's (H+1, W+1); crop the trailing row/col.
        return v(dy, dx_)[..., :H, :W]

    def box(dx0, dy0, dx1, dy1):
        return (at(dy1, dx1) - at(dy0, dx1) - at(dy1, dx0) + at(dy0, dx0))

    dxm = box(0, -hs, hs, hs) - box(-hs, -hs, 0, hs)
    dym = box(-hs, 0, hs, hs) - box(-hs, -hs, hs, 0)
    return dxm, dym


def describe(img, xy, *, size=None, angle=None, extended: bool = False,
             upright: bool = False):
    """SURF descriptor (64-d, or 128-d extended) for (N,2) keypoints.

    20s window, 4x4 subregions, 5x5 samples each, Haar size 2s, Gaussian
    weight 3.3s; subregion sums (dx, dy, |dx|, |dy|) — extended splits
    by the sign of the co-gradient (surf.cpp:800-860).  L2-normalized.
    """
    from front_end_tpu.types import Descriptors

    img = jnp.asarray(img, jnp.float32)
    xy = jnp.asarray(xy)
    n = xy.shape[0]
    const_size = size is None
    if size is None:
        size = jnp.full((n,), 9.0)
    if angle is None or upright:
        angle = jnp.zeros((n,))
    ii = integral_image(img)
    s = jnp.maximum(1.2 * jnp.asarray(size) / 9.0, 1.0)      # (N,)

    # 20x20 sample offsets in units of s (centres of unit cells)
    grid = np.mgrid[-10:10, -10:10].astype(np.float32) + 0.5  # (2, 20, 20)
    gy = grid[0].reshape(-1)
    gx = grid[1].reshape(-1)                                  # (400,)
    gw = np.exp(-(gx**2 + gy**2) / (2 * 3.3**2)).astype(np.float32)
    gxj, gyj, gwj = jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(gw)

    ca, sa = jnp.cos(angle), jnp.sin(angle)                   # (N,)
    rx = (gxj[None] * ca[:, None] - gyj[None] * sa[:, None]) * s[:, None]
    ry = (gxj[None] * sa[:, None] + gyj[None] * ca[:, None]) * s[:, None]
    px = jnp.round(xy[:, 0:1] + rx).astype(jnp.int32)         # (N, 400)
    py = jnp.round(xy[:, 1:2] + ry).astype(jnp.int32)
    if const_size:
        # Constant Haar half-size (the live/grid-detector path, size=9
        # -> hs=1): build DENSE dx/dy Haar maps once from shifted views
        # of the integral image and take ONE integer lookup per sample
        # per map — 8x fewer serialized gather elements than the
        # per-sample 16-corner integral lookups of the generic path
        # (measured 156 ms -> ~25 ms at N=2304 on KITTI frames).
        dxm, dym = _haar_maps(ii, 1)                          # (H, W)
        H, W = img.shape[-2:]
        pxc = jnp.clip(px, 0, W - 1)
        pyc = jnp.clip(py, 0, H - 1)
        idx = pyc * W + pxc
        dx = dxm.reshape(-1)[idx]
        dy = dym.reshape(-1)[idx]
    else:
        hs = jnp.maximum(jnp.round(s), 1.0).astype(jnp.int32)[:, None] \
            * jnp.ones_like(px)
        dx, dy = _haar_xy(ii, px, py, hs)                     # (N, 400)
    # rotate responses into the keypoint frame
    rdx = dx * ca[:, None] + dy * sa[:, None]
    rdy = -dx * sa[:, None] + dy * ca[:, None]
    rdx = rdx * gwj[None]
    rdy = rdy * gwj[None]

    # 4x4 subregions of 5x5 samples
    sub = ((gx + 10.0) // 5).astype(np.int32) * 4 \
        + ((gy + 10.0) // 5).astype(np.int32)                 # (400,) 0..15
    onehot = jnp.asarray(np.eye(16, dtype=np.float32)[sub])   # (400, 16)

    def pool(v):
        return v @ onehot                                      # (N, 16)

    if not extended:
        feats = [pool(rdx), pool(rdy), pool(jnp.abs(rdx)),
                 pool(jnp.abs(rdy))]
    else:
        pos_y, neg_y = rdy >= 0, rdy < 0
        pos_x, neg_x = rdx >= 0, rdx < 0
        feats = [pool(jnp.where(pos_y, rdx, 0.0)),
                 pool(jnp.where(neg_y, rdx, 0.0)),
                 pool(jnp.where(pos_y, jnp.abs(rdx), 0.0)),
                 pool(jnp.where(neg_y, jnp.abs(rdx), 0.0)),
                 pool(jnp.where(pos_x, rdy, 0.0)),
                 pool(jnp.where(neg_x, rdy, 0.0)),
                 pool(jnp.where(pos_x, jnp.abs(rdy), 0.0)),
                 pool(jnp.where(neg_x, jnp.abs(rdy), 0.0))]
    vec = jnp.concatenate(feats, -1)                          # (N, 64/128)
    vec = vec / jnp.maximum(jnp.linalg.norm(vec, axis=-1, keepdims=True),
                            1e-9)
    return Descriptors(bits=vec)   # float descriptor: matched with NORM_L2


def detect_and_describe(img, *, hessian_threshold: float = 100.0,
                        n_octaves: int = 3, n_octave_layers: int = 2,
                        max_keypoints: int = 1024, extended: bool = False,
                        upright: bool = False):
    det = detect(img, hessian_threshold=hessian_threshold,
                 n_octaves=n_octaves, n_octave_layers=n_octave_layers,
                 max_keypoints=max_keypoints)
    ii = integral_image(jnp.asarray(img, jnp.float32))
    kps = det.keypoints
    if upright:
        ang = jnp.zeros((kps.capacity,))
    else:
        ang = orientations(ii, kps.xy, det.size, kps.valid)
    desc = describe(img, kps.xy, size=det.size, angle=ang,
                    extended=extended, upright=upright)
    return det._replace(keypoints=kps.replace(angle=ang)), desc
