"""Windowed bundle adjustment: Schur-complement Levenberg-Marquardt.

Replaces the reference's g2o backend (`/root/reference/src/sba_node.cpp:
84-100`: BlockSolver_6_3 + LinearSolverCholmod + Levenberg) with a dense-
block TPU formulation.  The window is small (poses W ≤ ~10, the reference
uses 3: `front_end_window_node.cpp:6`) while landmarks are many, so the
classic Schur trick applies:

  H = [ Hpp  Hpl ]   with Hll block-diagonal (3×3 per landmark)
      [ Hlp  Hll ]
  S   = Hpp − Hpl·Hll⁻¹·Hlp          (6W × 6W, small)
  rhs = bp − Hpl·Hll⁻¹·bl
  δp  = solve(S, rhs);   δl = Hll⁻¹(bl − Hlp·δp)

Everything is laid out on the dense (L, W) observation grid with a
visibility mask — the TPU-native answer to g2o's sparse graphs: each stage
is one einsum over the grid, and the landmark dimension L is the natural
sharding axis for the distributed version (`ba/distributed.py`): each
shard reduces its partial S and rhs (the "reduced camera system") with a
psum, the tiny solve is replicated, back-substitution stays local.

Gauge: the first pose is held fixed via a large diagonal prior on its
block (shape-static equivalent of g2o's `setFixed`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from front_end_tpu.geometry import se3
from front_end_tpu.geometry.camera import StereoRig
from front_end_tpu.ba import factors
from front_end_tpu.utils.precision import f32_precision

GAUGE_PRIOR = 1e12


class BAResult(NamedTuple):
    poses: jnp.ndarray        # (W, 4, 4) camera_from_world
    landmarks: jnp.ndarray    # (L, 3) world frame
    cost: jnp.ndarray         # final robust cost
    cost0: jnp.ndarray        # initial robust cost
    rms_px: jnp.ndarray       # final masked RMS reprojection error (px)


def _normal_equations(poses, X, meas, vis_w, rig, huber_px):
    """Build all H/b blocks for the current linearization point.

    poses: (W,4,4); X: (L,3); meas: (L,W,4); vis_w: (L,W) float weights.
    Returns (Hpp (W,6,6), Hpl (L,W,6,3), Hll (L,3,3), bp (W,6), bl (L,3),
             cost, wsum_r2).
    """
    r, Jp, Jl = factors.residual_and_jacobians(
        poses[None, :], X[:, None, :], meas, rig)       # (L,W,4[,·])
    r2 = jnp.sum(r * r, -1)
    w = factors.huber_weight(r2, huber_px) * vis_w       # (L,W)
    cost = jnp.sum(factors.robust_cost(r2, huber_px) * vis_w)

    Jpw = Jp * w[..., None, None]
    Hpp = jnp.einsum("lwri,lwrj->wij", Jpw, Jp)          # (W,6,6)
    Hll = jnp.einsum("lwri,lwrj->lij",
                     Jl * w[..., None, None], Jl)        # (L,3,3)
    Hpl = jnp.einsum("lwri,lwrj->lwij", Jpw, Jl)         # (L,W,6,3)
    bp = -jnp.einsum("lwri,lwr->wi", Jpw, r)             # (W,6)
    bl = -jnp.einsum("lwri,lwr->li", Jl * w[..., None, None], r)
    return Hpp, Hpl, Hll, bp, bl, cost


def _inv3x3(M):
    """Batched closed-form (adjugate) 3x3 inverse.

    `jnp.linalg.inv` on (L,3,3) lowers to a generic LU path that costs
    ~5 ms at L=4608 on the v5e — the single hottest op in the windowed
    BA iteration; the adjugate form is pure elementwise math over the
    landmark axis (3x faster measured, identical to 1e-7)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    ca = e * i - f * h
    cb = -(d * i - f * g)
    cc = d * h - e * g
    cd = -(b * i - c * h)
    ce = a * i - c * g
    cf = -(a * h - b * g)
    cg = b * f - c * e
    ch = -(a * f - c * d)
    ci = a * e - b * d
    det = a * ca + b * cb + c * cc
    # Padded all-zero landmark blocks only carry the LM damping floor:
    # Hll_d = lam*1e-8*I gives det = (lam*1e-8)^3 which is subnormal f32
    # (flushed to 0 on TPU) once lam < ~3e-5, turning inv into inf and
    # poisoning S_off/rhs with 0*inf NaNs so every later step is
    # rejected.  Guard: a vanishing det means a ~zero block — substitute
    # det=1 so the adjugate (itself ~0) yields the desired ~0 inverse,
    # i.e. no contribution, matching the previous LU path's behaviour.
    det = jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
    inv = jnp.stack([jnp.stack([ca, cd, cg], -1),
                     jnp.stack([cb, ce, ch], -1),
                     jnp.stack([cc, cf, ci], -1)], -2)
    return inv / det[..., None, None]


def _schur_reduce(Hpp, Hpl, Hll, bp, bl, lam):
    """Form the reduced camera system (S, rhs) and the landmark inverse.

    This is the part a landmark-sharded device computes locally; S and rhs
    are the psum-reduced quantities in the distributed solver.
    """
    W = Hpp.shape[0]
    eye3 = jnp.eye(3)
    Hll_d = Hll + lam * (jnp.eye(3) * Hll + 1e-8 * eye3)  # LM-damped diag
    Hll_inv = _inv3x3(Hll_d)                              # (L,3,3)

    HplHinv = jnp.einsum("lwij,ljk->lwik", Hpl, Hll_inv)  # (L,W,6,3)
    S_off = jnp.einsum("lwik,lvjk->wvij", HplHinv, Hpl)   # (W,W,6,6)
    rhs = bp - jnp.einsum("lwij,lj->wi", HplHinv, bl)     # (W,6)
    return S_off, rhs, Hll_inv


def _assemble_and_solve(Hpp, S_off, rhs, lam):
    """Dense 6W×6W solve of the damped reduced system (replicated)."""
    W = Hpp.shape[0]
    Hpp_d = Hpp + lam * (jnp.eye(6) * Hpp + 1e-8 * jnp.eye(6))
    # gauge prior on pose 0
    prior = jnp.zeros((W, 6, 6)).at[0].set(jnp.eye(6) * GAUGE_PRIOR)
    diag = Hpp_d + prior
    S = (-S_off).at[jnp.arange(W), jnp.arange(W)].add(diag)  # (W,W,6,6)
    Sd = S.transpose(0, 2, 1, 3).reshape(6 * W, 6 * W)
    dxi = jnp.linalg.solve(Sd, rhs.reshape(-1))
    return dxi.reshape(W, 6)


def _back_substitute(Hll_inv, bl, Hpl, dxi):
    """δl = Hll⁻¹ (bl − Hlpᵀ·δp) — local on each landmark shard."""
    corr = jnp.einsum("lwij,wi->lj", Hpl, dxi)
    return jnp.einsum("lij,lj->li", Hll_inv, bl - corr)


def _apply(poses, X, dxi, dX):
    new_poses = jax.vmap(lambda d, T: se3.se3_exp(d) @ T)(dxi, poses)
    return new_poses, X + dX


def _cost_only(poses, X, meas, vis_w, rig, huber_px):
    r = factors.residual(poses[None, :], X[:, None, :], meas, rig)
    r2 = jnp.sum(r * r, -1)
    return jnp.sum(factors.robust_cost(r2, huber_px) * vis_w)


@f32_precision
def ba_solve(poses0, X0, meas, vis, rig: StereoRig, *, iters: int = 12,
             huber_px: float = 3.0, lam0: float = 1e-4) -> BAResult:
    """Run LM on a window.  poses0: (W,4,4) camera_from_world initial;
    X0: (L,3); meas: (L,W,4); vis: (L,W) bool.
    """
    poses0 = jnp.asarray(poses0)
    X0 = jnp.asarray(X0)
    vis_w = jnp.asarray(vis, jnp.float32)
    meas = jnp.asarray(meas)

    # One linearization pass PER ITERATION instead of two: the normal-
    # equation blocks of the last ACCEPTED state ride in the carry, the
    # tentative state's NE pass doubles as its cost evaluation (its cost
    # IS the robust cost at that state), and a rejected step simply
    # keeps the carried blocks.  Identical LM decision sequence, ~40%
    # fewer residual/Jacobian passes (iters+1 vs 2*iters).
    ne0 = _normal_equations(poses0, X0, meas, vis_w, rig, huber_px)
    cost0 = ne0[5]

    def step(carry, _):
        poses, X, lam, cost, (Hpp, Hpl, Hll, bp, bl) = carry
        S_off, rhs, Hll_inv = _schur_reduce(Hpp, Hpl, Hll, bp, bl, lam)
        dxi = _assemble_and_solve(Hpp, S_off, rhs, lam)
        dX = _back_substitute(Hll_inv, bl, Hpl, dxi)
        new_poses, new_X = _apply(poses, X, dxi, dX)
        nH = _normal_equations(new_poses, new_X, meas, vis_w, rig,
                               huber_px)
        new_cost = nH[5]
        accept = new_cost < cost
        poses = jnp.where(accept, new_poses, poses)
        X = jnp.where(accept, new_X, X)
        cost = jnp.where(accept, new_cost, cost)
        ne = jax.tree.map(lambda new, old: jnp.where(accept, new, old),
                          tuple(nH[:5]), (Hpp, Hpl, Hll, bp, bl))
        lam = jnp.clip(jnp.where(accept, lam * 0.3, lam * 5.0), 1e-9, 1e8)
        return (poses, X, lam, cost, ne), cost

    (poses, X, _, cost, _), _ = jax.lax.scan(
        step, (poses0, X0, jnp.asarray(lam0), cost0, tuple(ne0[:5])),
        None, length=iters)

    r = factors.residual(poses[None, :], X[:, None, :], meas, rig)
    r2 = jnp.sum(r * r, -1) * vis_w
    nobs = jnp.maximum(jnp.sum(vis_w) * 4.0, 1.0)
    rms = jnp.sqrt(jnp.sum(r2) / nobs)
    return BAResult(poses=poses, landmarks=X, cost=cost, cost0=cost0,
                    rms_px=rms)
