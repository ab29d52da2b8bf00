"""Motion-only bundle adjustment: 6-DoF Levenberg-Marquardt on SE(3).

Replaces the reference's `BAextractor` (`/root/reference/src/front_end/
algorithm.py:396-436,933-966`): scipy `least_squares` over an
[r,p,y,x,y,z] vector with residual = reprojection error of previous-frame
landmarks into the current stereo pair (max_nfev 500).

TPU-native design: the pose lives on the SE(3) manifold (local se3_exp
updates — no Euler gimbal issues), the Jacobian of the 6-parameter model
comes from forward-mode AD, and the solver is a fixed-iteration
`lax.fori_loop` LM with Huber robust weights — one compiled program, no
host round-trips, vmappable over frames/windows.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from front_end_tpu.geometry import se3
from front_end_tpu.geometry.camera import StereoRig
from front_end_tpu.utils.precision import f32_precision


class LMResult(NamedTuple):
    H: jnp.ndarray          # (4,4) refined extrinsic map a->b
    cost: jnp.ndarray       # final robust cost
    cost0: jnp.ndarray      # initial robust cost


def _residuals(xi, H0, Xa, uvb, rig: StereoRig):
    """Stereo reprojection residual r (N,4): project H·Xa into the current
    pair and compare with measured [ul,vl,ur,vr]."""
    H = se3.se3_exp(xi) @ H0
    Xb = se3.transform_points(H, Xa)
    pred = rig.project4(Xb)
    return pred - uvb


def _huber_w(r2, delta):
    r = jnp.sqrt(r2 + 1e-12)
    return jnp.where(r <= delta, 1.0, delta / r)


@f32_precision
def refine_motion(H0, Xa, uvb, valid, rig: StereoRig, *,
                  iters: int = 10, huber_px: float = 3.0,
                  lm_lambda0: float = 1e-3) -> LMResult:
    """LM refinement of the extrinsic map a->b.

    Xa: (N,3) landmarks in frame a (stereo-triangulated), uvb: (N,4)
    measured [ul,vl,ur,vr] in frame b, valid: (N,) mask.
    """
    Xa = jnp.asarray(Xa)
    uvb = jnp.asarray(uvb)
    w_valid = jnp.asarray(valid, jnp.float32)

    def robust_cost(xi):
        r = _residuals(xi, H0, Xa, uvb, rig)
        r2 = jnp.sum(r * r, -1)
        # Huber rho
        d = huber_px
        rho = jnp.where(r2 <= d * d, r2, 2.0 * d * jnp.sqrt(r2 + 1e-12) - d * d)
        return jnp.sum(rho * w_valid)

    def step(carry, _):
        xi, lam, cost = carry
        r = _residuals(xi, H0, Xa, uvb, rig)               # (N,4)
        J = jax.jacfwd(lambda v: _residuals(v, H0, Xa, uvb, rig))(xi)
        r2 = jnp.sum(r * r, -1)
        w = _huber_w(r2, huber_px) * w_valid               # (N,)
        Jw = J * w[:, None, None]
        A = jnp.einsum("nri,nrj->ij", Jw, J)               # (6,6)
        g = jnp.einsum("nri,nr->i", Jw, r)                 # (6,)
        A_lm = A + lam * jnp.diag(jnp.diagonal(A) + 1e-8)
        dx = -jnp.linalg.solve(A_lm, g)
        xi_new = se3.se3_log(se3.se3_exp(dx) @ se3.se3_exp(xi))
        cost_new = robust_cost(xi_new)
        accept = cost_new < cost
        xi = jnp.where(accept, xi_new, xi)
        cost = jnp.where(accept, cost_new, cost)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-9, 1e6)
        return (xi, lam, cost), None

    xi0 = jnp.zeros(6, Xa.dtype)
    cost0 = robust_cost(xi0)
    (xi, _, cost), _ = jax.lax.scan(
        step, (xi0, jnp.asarray(lm_lambda0), cost0), None, length=iters)
    return LMResult(H=se3.se3_exp(xi) @ H0, cost=cost, cost0=cost0)
