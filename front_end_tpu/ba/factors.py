"""Stereo reprojection factors for windowed bundle adjustment.

The measurement model is the reference's `landmarkEdge`
(`/root/reference/src/sba_solver.cpp:57-86`, header `include/front_end/
sba_solver.hpp:15-40`): a binary factor between a 6-DoF pose and a 3D
landmark whose 4-vector residual is the stereo reprojection error
[ul, vl, ur, vr] in both rectified cameras.

Jacobians are produced analytically (not AD) so the (L, W) observation
grid evaluates as a few fused einsums:  with  Xc = T·Xw,
  d r / d Xc  : the 4×3 projection derivative,
  d Xc / d xi = [I | −[Xc]×]  (left-multiplied local se3 update),
  d Xc / d Xw = R.
"""
from __future__ import annotations

import jax.numpy as jnp

from front_end_tpu.geometry import se3
from front_end_tpu.geometry.camera import StereoRig


def residual(T, Xw, z, rig: StereoRig):
    """r = project4(T·Xw) − z.

    T: (..., 4, 4) camera_from_world; Xw: (..., 3); z: (..., 4).
    """
    Xc = se3.transform_points(T, Xw[..., None, :])[..., 0, :]
    return rig.project4(Xc) - jnp.asarray(z)


def residual_and_jacobians(T, Xw, z, rig: StereoRig):
    """Residual plus analytic Jacobians wrt the local pose update and the
    landmark, for a broadcastable batch of observations.

    T: (..., 4, 4); Xw: (..., 3); z: (..., 4).
    Returns (r (...,4), Jp (...,4,6), Jl (...,4,3)).

    The pose update convention matches the solvers: T ← se3_exp(δ)·T with
    δ = [v, w]; so dXc/dδ = [ I  −[Xc]× ].
    """
    T = jnp.asarray(T)
    Xw = jnp.asarray(Xw)
    R = T[..., :3, :3]
    Xc = jnp.einsum("...ij,...j->...i", R, Xw) + T[..., :3, 3]
    x, y = Xc[..., 0], Xc[..., 1]
    z_ = jnp.where(jnp.abs(Xc[..., 2]) < 1e-6, 1e-6, Xc[..., 2])
    iz = 1.0 / z_
    iz2 = iz * iz
    fx, fy, b = rig.fx, rig.fy, rig.baseline

    ul = fx * x * iz + rig.cx
    vl = fy * y * iz + rig.cy
    ur = fx * (x - b) * iz + rig.cx
    r = jnp.stack([ul, vl, ur, vl], -1) - jnp.asarray(z)

    zero = jnp.zeros_like(x)
    # d[ul,vl,ur,vr]/dXc  (4,3)
    dul = jnp.stack([fx * iz, zero, -fx * x * iz2], -1)
    dvl = jnp.stack([zero, fy * iz, -fy * y * iz2], -1)
    dur = jnp.stack([fx * iz, zero, -fx * (x - b) * iz2], -1)
    dP = jnp.stack([dul, dvl, dur, dvl], -2)          # (..., 4, 3)

    # dXc/dδ = [I | −[Xc]×]   (3, 6)
    dXc = jnp.concatenate([
        jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), Xc.shape + (3,)),
        -se3.hat(Xc)], -1)                            # (..., 3, 6)
    Jp = jnp.einsum("...ri,...ij->...rj", dP, dXc)    # (..., 4, 6)
    Jl = jnp.einsum("...ri,...ij->...rj", dP, R)      # (..., 4, 3)
    return r, Jp, Jl


def huber_weight(r2, delta: float):
    """IRLS weight for the Huber kernel on the squared residual norm."""
    rn = jnp.sqrt(r2 + 1e-12)
    return jnp.where(rn <= delta, 1.0, delta / rn)


def robust_cost(r2, delta: float):
    rn = jnp.sqrt(r2 + 1e-12)
    return jnp.where(rn <= delta, r2, 2.0 * delta * rn - delta * delta)
