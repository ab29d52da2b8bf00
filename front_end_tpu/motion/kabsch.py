"""Rigid 3D-3D alignment (Kabsch / closed-form SVD).

Capability of the reference's `rigid_transform_3D`
(`/root/reference/src/front_end/algorithm.py:34-51`) and the motion core of
`bumblebee.slidingGraph.svdRANSAC`, generalised to weighted/masked form so
it slots into vmapped RANSAC hypothesis batches (weights are the static-
shape replacement for the reference's dynamic inlier lists).

Returns the homogeneous pose H = [R | t] with Xb ≈ R·Xa + t, i.e. the
extrinsic map frame a -> frame b (what the reference's estimators recover
and then report through `decomposeTransform`).
"""
from __future__ import annotations

import jax.numpy as jnp

from front_end_tpu.geometry import se3


from front_end_tpu.utils.precision import f32_precision


@f32_precision
def rigid_transform_3d(Xa, Xb, weights=None):
    """Weighted Kabsch.  Xa, Xb: (..., N, 3); weights: (..., N) or None.

    Solves min_RT sum_i w_i ||R·Xa_i + t − Xb_i||² via SVD of the weighted
    cross-covariance, with the det<0 reflection fix of `algorithm.py:44-47`.
    Fully batched and jittable; zero-weight rows are ignored.
    """
    Xa, Xb = jnp.asarray(Xa), jnp.asarray(Xb)
    # Geometry einsums must not fall back to bf16 MXU passes (the TPU
    # default for f32): millimetre-level motion errors otherwise.
    if weights is None:
        weights = jnp.ones(Xa.shape[:-1], Xa.dtype)
    w = jnp.asarray(weights, Xa.dtype)
    wsum = jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-9)
    wn = w / wsum

    ca = jnp.sum(wn[..., None] * Xa, -2)                 # (...,3) centroids
    cb = jnp.sum(wn[..., None] * Xb, -2)
    A = Xa - ca[..., None, :]
    B = Xb - cb[..., None, :]
    Hc = jnp.einsum("...ni,...nj->...ij", wn[..., None] * A, B)

    U, _, Vt = jnp.linalg.svd(Hc)
    V = jnp.swapaxes(Vt, -1, -2)
    Ut = jnp.swapaxes(U, -1, -2)
    R = V @ Ut
    # reflection fix: flip the last column of V where det(R) < 0
    det = jnp.linalg.det(R)
    flip = jnp.where(det < 0, -1.0, 1.0)[..., None]
    Vf = V.at[..., :, 2].multiply(flip)
    R = Vf @ Ut
    t = cb - jnp.einsum("...ij,...j->...i", R, ca)
    return se3.create_homog(R, t)


def alignment_residuals(H, Xa, Xb):
    """Per-landmark Euclidean residual ||H·Xa − Xb|| : (..., N)."""
    pred = se3.transform_points(H, Xa)
    return jnp.linalg.norm(pred - jnp.asarray(Xb), axis=-1)
