"""Nister 5-point essential-matrix solver — TPU-native formulation.

The reference uses the `five-point-nister` C++ library for its window
egomotion (`/root/reference/include/front_end/WindowMatcher.hpp:39`,
`src/WindowMatcher.cpp:247-253` findEssentialMat(RANSAC, prob .99, thr 1))
and spells out its own SVD decomposition path in `nisterExtract`
(`src/front_end/algorithm.py:1473-1605`).

Classic implementations root the degree-10 polynomial with a companion-
matrix eigensolve — a nonsymmetric eig that XLA/TPU cannot express.  This
module uses the *hidden-variable resultant* instead, built from fixed-
shape batched linear algebra only:

1.  nullspace: SVD of the 5×9 epipolar design matrix → basis X, Y, Z, W
    with E = xX + yY + zZ + W;
2.  the 10 cubic constraints (det E = 0 and 2·E·Eᵀ·E − tr(E·Eᵀ)·E = 0)
    are expanded by static trace-time polynomial arithmetic into
    Q(z) · m(x, y) = 0, where Q is a 10×10 matrix with degree-≤3
    polynomial entries in z and m is the vector of x,y-monomials;
3.  real roots of det Q(z) (degree ≤ 30; contains all essential z's) are
    located by sign changes of batched 10×10 determinants over a
    tan-substituted sample grid — rows scaled by cos³θ so entries stay
    bounded over z ∈ (−∞, ∞) — then polished by a fixed-iteration
    bisection (all `lax.fori_loop`, no data-dependent shapes);
4.  per root, (x, y) is read off the SVD nullvector of Q(z*).

Up to `MAX_ROOTS` candidate E's per minimal sample, with validity masks;
spurious resultant roots simply score no consensus under RANSAC.  Under
vmapped RANSAC the 5-point minimal sample needs w⁵ (not w⁸) all-inlier
probability — at 50 % outliers, ~25× fewer hypotheses than 8-point for
the same confidence.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from front_end_tpu.utils.precision import f32_precision

MAX_ROOTS = 10
N_SCAN = 128          # z-grid sample count for sign-change scan
N_BISECT = 36         # bisection iterations (θ-space)

# x,y-monomial groups of the cubic system, fixed column order
_XY_GROUPS = ((3, 0), (2, 1), (1, 2), (0, 3), (2, 0), (1, 1), (0, 2),
              (1, 0), (0, 1), (0, 0))
_IDX_X = _XY_GROUPS.index((1, 0))
_IDX_Y = _XY_GROUPS.index((0, 1))
_IDX_1 = _XY_GROUPS.index((0, 0))


# --- static trace-time polynomial arithmetic over (x, y, z) -------------------

def _pzero(d):
    return [[[None] * (d + 1) for _ in range(d + 1)] for _ in range(d + 1)]


def _padd(a, b):
    d = len(a) - 1
    out = _pzero(d)
    for i in range(d + 1):
        for j in range(d + 1):
            for k in range(d + 1):
                u, v = a[i][j][k], b[i][j][k]
                out[i][j][k] = (u if v is None else
                                v if u is None else u + v)
    return out


def _pmul(a, b, da, db):
    """Multiply degree-da by degree-db polynomial tables."""
    d = da + db
    out = _pzero(d)
    for i1 in range(da + 1):
        for j1 in range(da + 1):
            for k1 in range(da + 1):
                u = a[i1][j1][k1]
                if u is None:
                    continue
                for i2 in range(db + 1):
                    for j2 in range(db + 1):
                        for k2 in range(db + 1):
                            v = b[i2][j2][k2]
                            if v is None:
                                continue
                            i, j, k = i1 + i2, j1 + j2, k1 + k2
                            w = u * v
                            cur = out[i][j][k]
                            out[i][j][k] = w if cur is None else cur + w
    return out


def _e_entry_poly(X, Y, Z, W, r, c):
    """E[r,c] = x·X + y·Y + z·Z + W as a degree-1 table."""
    p = _pzero(1)
    p[1][0][0] = X[r, c]
    p[0][1][0] = Y[r, c]
    p[0][0][1] = Z[r, c]
    p[0][0][0] = W[r, c]
    return p


def _constraint_tensor(X, Y, Z, W):
    """The 10 cubic constraints as Qc[(constraint, xy-group, z-power)]
    — a (10, 10, 4) tensor of traced scalars."""
    E = [[_e_entry_poly(X, Y, Z, W, r, c) for c in range(3)]
         for r in range(3)]

    def mul(a, b):
        return _pmul(a, b, 1, 1)          # deg1 x deg1 -> deg2

    def mul21(a, b):
        return _pmul(a, b, 2, 1)          # deg2 x deg1 -> deg3

    def neg(p, d):
        out = _pzero(d)
        for i in range(d + 1):
            for j in range(d + 1):
                for k in range(d + 1):
                    if p[i][j][k] is not None:
                        out[i][j][k] = -p[i][j][k]
        return out

    cubics = []
    # det(E) = 0
    m00 = _padd(mul(E[1][1], E[2][2]), neg(mul(E[1][2], E[2][1]), 2))
    m01 = _padd(mul(E[1][0], E[2][2]), neg(mul(E[1][2], E[2][0]), 2))
    m02 = _padd(mul(E[1][0], E[2][1]), neg(mul(E[1][1], E[2][0]), 2))
    det = _padd(_padd(mul21(m00, E[0][0]), neg(mul21(m01, E[0][1]), 3)),
                mul21(m02, E[0][2]))
    cubics.append(det)

    # EEt (deg 2)
    EEt = [[None] * 3 for _ in range(3)]
    for r in range(3):
        for c in range(3):
            s = mul(E[r][0], E[c][0])
            s = _padd(s, mul(E[r][1], E[c][1]))
            s = _padd(s, mul(E[r][2], E[c][2]))
            EEt[r][c] = s
    tr = _padd(_padd(EEt[0][0], EEt[1][1]), EEt[2][2])

    # 2·EEt·E − tr·E (deg 3), 9 constraints
    for r in range(3):
        for c in range(3):
            s = mul21(EEt[r][0], E[0][c])
            s = _padd(s, mul21(EEt[r][1], E[1][c]))
            s = _padd(s, mul21(EEt[r][2], E[2][c]))
            two_s = _pzero(3)
            for i in range(4):
                for j in range(4):
                    for k in range(4):
                        if s[i][j][k] is not None:
                            two_s[i][j][k] = 2.0 * s[i][j][k]
            s = _padd(two_s, neg(mul21(tr, E[r][c]), 3))
            cubics.append(s)

    rows = []
    for p in cubics:
        row = []
        for (gi, gj) in _XY_GROUPS:
            zs = []
            for k in range(4):
                v = (p[gi][gj][k]
                     if (gi + gj + k) <= 3 and p[gi][gj][k] is not None
                     else jnp.zeros(()))
                zs.append(v)
            row.append(jnp.stack(zs))
        rows.append(jnp.stack(row))
    return jnp.stack(rows)                       # (10, 10, 4)


# --- root finding ---------------------------------------------------------------

def _theta_weights(theta):
    """Scaled z-power weights [c³, s·c², s²·c, s³] with z = tanθ — each
    Q entry times cos³θ stays bounded; det picks up cos³⁰θ > 0."""
    s, c = jnp.sin(theta), jnp.cos(theta)
    return jnp.stack([c ** 3, s * c * c, s * s * c, s ** 3], -1)


def _sign_at(qc, theta):
    """Sign of det Q at angles theta (...,) via batched slogdet — immune
    to the cos³⁰θ scale factor that underflows a raw f32 determinant
    near θ → ±π/2 (where large-|z| roots live)."""
    w = _theta_weights(theta)                         # (..., 4)
    Q = jnp.einsum("cgk,...k->...cg", qc, w)
    sign, _ = jnp.linalg.slogdet(Q)
    # an exactly-singular sample sits ON a root; count it as positive so
    # the neighbouring interval still registers the crossing
    return jnp.where(sign == 0, 1.0, sign)


class FivePointResult(NamedTuple):
    E: jnp.ndarray          # (MAX_ROOTS, 3, 3) candidates (Frobenius-normed)
    valid: jnp.ndarray      # (MAX_ROOTS,) bool


@f32_precision
def five_point_candidates(xa, xb) -> FivePointResult:
    """All essential matrices through 5 normalized correspondences.

    xa, xb: (5, 2) normalized camera coordinates (K removed).
    """
    xa, xb = jnp.asarray(xa), jnp.asarray(xb)
    x1, y1 = xa[:, 0], xa[:, 1]
    x2, y2 = xb[:, 0], xb[:, 1]
    one = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2,
                   x1, y1, one], -1)                  # (5, 9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    X = Vt[5].reshape(3, 3)
    Y = Vt[6].reshape(3, 3)
    Z = Vt[7].reshape(3, 3)
    W = Vt[8].reshape(3, 3)

    qc = _constraint_tensor(X, Y, Z, W)               # (10, 10, 4)

    # scan for sign changes over θ ∈ (−π/2, π/2)
    eps = 1e-3
    thetas = jnp.linspace(-np.pi / 2 + eps, np.pi / 2 - eps, N_SCAN)
    sign = _sign_at(qc, thetas)                       # (N_SCAN,)
    flip = (sign[:-1] * sign[1:]) < 0                 # (N_SCAN-1,)

    # earliest MAX_ROOTS flip positions (static shapes)
    score = jnp.where(flip, (N_SCAN - jnp.arange(N_SCAN - 1)).astype(
        jnp.float32), 0.0)
    v, pos = jax.lax.top_k(score, MAX_ROOTS)
    has_root = v > 0.0
    lo = thetas[pos]
    hi = thetas[jnp.minimum(pos + 1, N_SCAN - 1)]
    s_lo = sign[pos]

    def body(_, state):
        lo, hi, s_lo = state
        mid = 0.5 * (lo + hi)
        s_mid = _sign_at(qc, mid)                     # (MAX_ROOTS,)
        same = s_mid == s_lo
        lo = jnp.where(same, mid, lo)
        s_lo = jnp.where(same, s_mid, s_lo)
        hi = jnp.where(same, hi, mid)
        return lo, hi, s_lo

    lo, hi, _ = jax.lax.fori_loop(0, N_BISECT, body, (lo, hi, s_lo))
    theta_r = 0.5 * (lo + hi)
    z = jnp.tan(theta_r)                              # (MAX_ROOTS,)

    # nullvector of Q(z*) -> x, y
    w = _theta_weights(theta_r)                       # (MAX_ROOTS, 4)
    Q = jnp.einsum("cgk,rk->rcg", qc, w)              # (R, 10, 10)
    _, _, Vt_q = jnp.linalg.svd(Q)
    m = Vt_q[:, -1, :]                                # (R, 10)
    denom = m[:, _IDX_1]
    ok = jnp.abs(denom) > 1e-9
    denom = jnp.where(ok, denom, 1.0)
    x = m[:, _IDX_X] / denom
    y = m[:, _IDX_Y] / denom

    E = (x[:, None, None] * X + y[:, None, None] * Y
         + z[:, None, None] * Z + W[None])
    nrm = jnp.linalg.norm(E.reshape(MAX_ROOTS, -1), axis=-1)
    E = E / jnp.maximum(nrm, 1e-12)[:, None, None]
    finite = jnp.all(jnp.isfinite(E.reshape(MAX_ROOTS, -1)), -1)
    return FivePointResult(E=E, valid=has_root & ok & finite)


def ransac_five_point(key, xa, xb, valid, *, n_hyps: int = 64,
                      threshold: float = 1e-3):
    """Batched 5-point RANSAC over normalized correspondences.

    Each of the `n_hyps` minimal samples yields up to MAX_ROOTS candidate
    E's; all n_hyps·MAX_ROOTS candidates are scored by Sampson consensus
    in one batch.  Returns (E_best, inliers, n_inliers, scores).
    """
    from front_end_tpu.motion import ransac as ransac_mod
    from front_end_tpu.motion.essential import sampson_error

    idx = ransac_mod.sample_minimal_sets(key, valid, n_hyps, 5)

    def one(ids):
        return five_point_candidates(xa[ids], xb[ids])

    cands = jax.vmap(one)(idx)                        # E (B, R, 3, 3)
    Es = cands.E.reshape(-1, 3, 3)
    ok = cands.valid.reshape(-1)

    def score(E, o):
        r = sampson_error(E, xa, xb)
        inl = (r < threshold) & valid
        return jnp.sum(inl) * o.astype(jnp.int32)

    scores = jax.vmap(score)(Es, ok)
    best = jnp.argmax(scores)
    E = Es[best]
    r = sampson_error(E, xa, xb)
    inliers = (r < threshold) & valid
    return E, inliers, jnp.sum(inliers), scores
