"""FREAK — retinal sampling pattern binary descriptor.

Rebuild of the cv::FREAK capability used by the reference's descriptor
benchmark set (`/root/reference/bin/detect_node:42-44` — FREAK is one of
the 7 benchmarked configurations, with `result_ONE/result_TWO` timing
plots) as a descriptor-only stage over any detector's keypoints.

Pattern: 43 receptive fields — 1 foveal centre + 7 concentric rings of
6 points — whose radius and smoothing grow coarse-to-fine toward the
periphery (the published FREAK retina).  Orientation comes from the 45
symmetric long pairs; the descriptor is 512 coarse-to-fine point-pair
intensity comparisons.

TPU shape: one blurred image per ring (8 static blur levels), batched
bilinear gathers at host-constant rotated offsets, comparisons and bit
assembly as dense vector ops — identical machinery to `ops/brisk.py`.

Documented deviation: OpenCV learns its 512 pairs offline from training
data; we select pairs deterministically coarse-to-fine (sorted by the
summed ring index of the endpoints, tie-broken by pair distance), which
keeps the descriptor self-consistent and static.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from front_end_tpu.ops.image import bilinear_sample, gaussian_blur
from front_end_tpu.types import Descriptors

N_RINGS = 8                      # foveal centre counts as ring 0
N_BITS = 512


@functools.lru_cache()
def _retina():
    """(P,2)[dy,dx] offsets, ring id, sigma per ring, 512 pair indices,
    orientation pairs (45, 2)."""
    pts, ring_id, sigmas = [(0.0, 0.0)], [0], [0.5]
    for r in range(1, N_RINGS):
        radius = 1.2 * r ** 1.4           # coarse-to-fine spacing
        sigma = 0.4 + 0.35 * r
        sigmas.append(sigma)
        phase = (np.pi / 6.0) * (r % 2)   # stagger alternate rings
        for i in range(6):
            a = 2 * np.pi * i / 6 + phase
            pts.append((radius * np.sin(a), radius * np.cos(a)))
            ring_id.append(r)
    pts = np.asarray(pts, np.float32)
    ring_id = np.asarray(ring_id, np.int32)

    n = pts.shape[0]
    pairs = np.asarray([(i, j) for i in range(n) for j in range(i + 1, n)],
                       np.int32)
    coarse = ring_id[pairs[:, 0]] + ring_id[pairs[:, 1]]
    dist = np.linalg.norm(pts[pairs[:, 0]] - pts[pairs[:, 1]], axis=1)
    order = np.lexsort((dist, -coarse.astype(np.float64)))
    desc_pairs = pairs[order][:N_BITS]

    # orientation pairs: opposite points on the same ring (3 per ring x 7)
    # plus ring-to-centre spokes — 45 symmetric gradients like the paper
    opairs = []
    base = 1
    for r in range(1, N_RINGS):
        for i in range(3):
            opairs.append((base + i, base + i + 3))
        for i in range(0, 6, 2):
            opairs.append((0, base + i))
        base += 6
    opairs = np.asarray(opairs[:45], np.int32)
    return pts, ring_id, np.asarray(sigmas, np.float32), desc_pairs, opairs


def _sample(img, xy, offsets, ring_id):
    """offsets (N,P,2)[dy,dx] -> samples (N,P), each point from its
    ring's blur level.

    ring_id is STATIC (numpy), so each ring's pattern points are known
    at trace time: gather ONLY those columns from that ring's blur
    instead of sampling every point from every blur (8 rings x N x P
    gathers -> N x P; gathers serialize on TPU, so this is ~8x)."""
    import numpy as _np

    pts_np, _rid, sigmas, _dp, _op = _retina()
    del pts_np
    blurs = [gaussian_blur(img, float(s)) for s in sigmas]
    px = xy[:, 0:1] + offsets[..., 1]
    py = xy[:, 1:2] + offsets[..., 0]
    rid_np = _np.asarray(ring_id)
    N, P = px.shape
    parts, col_order = [], []
    for r, b in enumerate(blurs):
        cols = _np.nonzero(rid_np == r)[0]
        if cols.size == 0:
            continue
        pr = jnp.stack([px[:, cols], py[:, cols]], -1).reshape(-1, 2)
        parts.append(bilinear_sample(b, pr).reshape(N, cols.size))
        col_order.append(cols)
    inv = _np.argsort(_np.concatenate(col_order))
    return jnp.concatenate(parts, axis=1)[:, inv]


def orientations(img, xy, valid, *, pattern_scale: float = 1.0):
    """Orientation from the 45 symmetric pairs:
    g = Σ (I(pi) − I(pj)) · (pi − pj) / ‖pi − pj‖."""
    img = jnp.asarray(img, jnp.float32)
    pts_np, ring_id, _s, _dp, opairs = _retina()
    offs = jnp.asarray(pts_np) * pattern_scale
    n = xy.shape[0]
    samples = _sample(img, xy, jnp.broadcast_to(offs, (n,) + offs.shape),
                      ring_id)
    pi = jnp.asarray(opairs[:, 0])
    pj = jnp.asarray(opairs[:, 1])
    dvec = offs[pi] - offs[pj]
    dn = jnp.maximum(jnp.linalg.norm(dvec, axis=-1), 1e-6)
    w = (samples[:, pi] - samples[:, pj]) / dn[None]
    gy = jnp.sum(w * dvec[None, :, 0] / dn[None], -1)
    gx = jnp.sum(w * dvec[None, :, 1] / dn[None], -1)
    ang = jnp.arctan2(gy, gx)
    return jnp.where(jnp.asarray(valid), ang, 0.0)


def describe(img, xy, angle, valid, *, pattern_scale: float = 1.0
             ) -> Descriptors:
    """512-bit retinal descriptor on the rotated pattern."""
    img = jnp.asarray(img, jnp.float32)
    pts_np, ring_id, _s, desc_pairs, _op = _retina()
    offs = jnp.asarray(pts_np) * pattern_scale
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    ry = offs[None, :, 0] * ca[:, None] + offs[None, :, 1] * sa[:, None]
    rx = -offs[None, :, 0] * sa[:, None] + offs[None, :, 1] * ca[:, None]
    samples = _sample(img, xy, jnp.stack([ry, rx], -1), ring_id)
    pi = jnp.asarray(desc_pairs[:, 0])
    pj = jnp.asarray(desc_pairs[:, 1])
    bits = (samples[:, pi] > samples[:, pj]).astype(jnp.float32)
    return Descriptors(bits=bits * jnp.asarray(valid)[:, None])


def describe_keypoints(img, keypoints, *, pattern_scale: float = 1.0,
                       oriented: bool = True):
    """Descriptor-only entry (FREAK always rides another detector, like
    the reference's FAST+FREAK config in `bin/detect_node:42-44`)."""
    ang = (orientations(img, keypoints.xy, keypoints.valid,
                        pattern_scale=pattern_scale)
           if oriented else keypoints.angle)
    desc = describe(img, keypoints.xy, ang, keypoints.valid,
                    pattern_scale=pattern_scale)
    return keypoints.replace(angle=ang), desc
