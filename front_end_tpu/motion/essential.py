"""Essential-matrix motion estimation: normalized 8-point + RANSAC,
Nister-style decomposition, cheirality voting, stereo scale recovery.

Covers the reference capabilities of `cvExtract`/`nisterExtract`
(`/root/reference/src/front_end/algorithm.py:1054-1107,1473-1605`) and the
`WindowMatcher` egomotion path (`src/WindowMatcher.cpp:247-302`):
findEssentialMat(RANSAC) -> recoverPose -> translation scale from stereo-
triangulated inlier pairs.

TPU-first choices:
- The minimal solver is the normalized 8-point algorithm (one batched SVD),
  not Nister's 5-point (10th-degree polynomial + nonsymmetric eigensolve,
  which XLA/TPU cannot express efficiently).  Under vmapped RANSAC with
  hundreds of hypotheses this reaches the same consensus sets on the
  reference's operating range; the RANSAC protocol (prob .99, threshold in
  px) is preserved.
- Decomposition uses the reference's D matrix (`~motion.py:27-32`
  `getDNister`) with the det sign fixes of `algorithm.py:1585-1600`.
- Cheirality is the standard both-depths-positive vote over RANSAC inliers
  (the reference's vote at `algorithm.py:1519-1547` checks z>0 in frame 0
  against the candidate's t_z sign — an idiosyncrasy, not replicated).
- Scale recovery: the reference's pseudo-inverse averaging
  (`~motion.py:170-186` `estimateScale`) algebraically collapses to
  T_new = mean_{inliers}(Xb − R·Xa); we implement that closed form.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from front_end_tpu.geometry import se3
from front_end_tpu.motion import ransac as ransac_mod
from front_end_tpu.utils.precision import f32_precision


def normalize_points(x):
    """Hartley normalization: zero centroid, mean distance sqrt(2).

    x: (N, 2) -> (x_norm (N,2), T (3,3)) with x_norm = T·x."""
    c = jnp.mean(x, 0)
    d = jnp.mean(jnp.linalg.norm(x - c, axis=-1))
    s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-9)
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    T = T.at[0, 0].set(s).at[1, 1].set(s)
    T = T.at[0, 2].set(-s * c[0]).at[1, 2].set(-s * c[1])
    return (x - c) * s, T


def eight_point(xa, xb, weights=None):
    """Normalized 8-point essential matrix from >= 8 correspondences.

    xa, xb: (N, 2) in NORMALIZED camera coordinates (K already removed).
    weights: optional (N,) row weights (inlier refit).
    Returns E (3,3), rank-2 enforced with singular values (1, 1, 0).
    """
    xa, xb = jnp.asarray(xa), jnp.asarray(xb)
    na, Ta = normalize_points(xa)
    nb, Tb = normalize_points(xb)
    x1, y1 = na[:, 0], na[:, 1]
    x2, y2 = nb[:, 0], nb[:, 1]
    one = jnp.ones_like(x1)
    # rows: xb^T E xa = 0
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2,
                   x1, y1, one], -1)                       # (N, 9)
    if weights is not None:
        A = A * jnp.asarray(weights)[:, None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    F = Vt[-1].reshape(3, 3)
    F = Tb.T @ F @ Ta                                      # denormalize
    # project onto the essential manifold
    U, _, Vt2 = jnp.linalg.svd(F)
    E = U @ jnp.diag(jnp.array([1.0, 1.0, 0.0])) @ Vt2
    return E


def sampson_error(E, xa, xb):
    """First-order geometric error (in the units of the input coords).

    xa, xb: (N, 2) normalized camera coords."""
    xa_h = jnp.concatenate([xa, jnp.ones_like(xa[:, :1])], -1)
    xb_h = jnp.concatenate([xb, jnp.ones_like(xb[:, :1])], -1)
    Ex1 = xa_h @ E.T                                       # (N,3) E·xa
    Etx2 = xb_h @ E                                        # (N,3) Eᵀ·xb
    num = jnp.sum(xb_h * Ex1, -1) ** 2
    den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    return jnp.sqrt(num / jnp.maximum(den, 1e-12))


# numpy, not jnp: module-level device arrays captured as jit constants
# degrade all later H2D transfers on the remote-TPU backend (see
# geometry/camera.py StereoRig.create).
_D_NISTER = np.array([[0.0, 1.0, 0.0],
                      [-1.0, 0.0, 0.0],
                      [0.0, 0.0, 1.0]], np.float32)  # getDNister, ~motion.py:27-32


def decompose_essential(E):
    """E -> (Ra, Rb, t) candidate decomposition (`algorithm.py:1585-1600`)."""
    U, _, Vt = jnp.linalg.svd(E)
    U = jnp.where(jnp.linalg.det(U) < 0, -U, U)
    Vt = jnp.where(jnp.linalg.det(Vt) < 0, -Vt, Vt)
    Ra = U @ _D_NISTER @ Vt
    Rb = U @ _D_NISTER.T @ Vt
    t = U[:, 2]
    return Ra, Rb, t


def triangulate_two_view(R, t, xa, xb):
    """DLT triangulation of normalized correspondences under P0=[I|0],
    P1=[R|t].  xa, xb: (N,2).  Returns (N,3) points in frame a and the
    depths (za, zb) for cheirality."""
    N = xa.shape[0]
    P0 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], -1)
    P1 = jnp.concatenate([R, t.reshape(3, 1)], -1)

    def row(P, x):
        # two rows per view: x*P3 - P1, y*P3 - P2
        return jnp.stack([x[:, 0:1] * P[2] - P[0],
                          x[:, 1:2] * P[2] - P[1]], 1)     # (N,2,4)

    A = jnp.concatenate([row(P0, xa), row(P1, xb)], 1)     # (N,4,4)
    _, _, Vt = jnp.linalg.svd(A)
    Xh = Vt[:, -1, :]                                      # (N,4)
    w = Xh[:, 3]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    X = Xh[:, :3] / w[:, None]
    za = X[:, 2]
    zb = (X @ R.T + t)[:, 2]
    return X, za, zb


def select_cheirality(E, xa, xb, inliers):
    """4-way candidate vote (`algorithm.py:1513-1569` capability): pick the
    (R, t) with the most inliers triangulating in front of BOTH cameras."""
    Ra, Rb, t = decompose_essential(E)
    cands_R = jnp.stack([Ra, Ra, Rb, Rb])
    cands_t = jnp.stack([t, -t, t, -t])

    def vote(R, tt):
        _, za, zb = triangulate_two_view(R, tt, xa, xb)
        return jnp.sum((za > 0) & (zb > 0) & inliers)

    votes = jax.vmap(vote)(cands_R, cands_t)
    best = jnp.argmax(votes)
    return cands_R[best], cands_t[best], votes


def estimate_scale(Xa, Xb, R, inliers, *, robust: bool = True,
                   max_range: float = 50.0):
    """Metric translation from stereo-triangulated pairs.

    Closed form of the reference's `estimateScale` (`~motion.py:170-186`):
    its 3x3 pseudo-inverse averaging satisfies  mean_i(M_i)·T ==
    mean_i((Xb_i − R·Xa_i)·(Tᵀ pinv(TTᵀ) T)) == mean_i(Xb_i − R·Xa_i),
    so the scaled translation is the inlier-average 3D displacement.

    Robustification (on by default, unlike the reference): rows whose
    triangulation exceeds `max_range` are dropped (a single near-zero-
    disparity point otherwise dominates), and the component-wise median
    replaces the mean.  `robust=False` reproduces the reference mean.
    """
    Xa, Xb = jnp.asarray(Xa), jnp.asarray(Xb)
    disp = Xb - Xa @ jnp.asarray(R).T
    ok = jnp.asarray(inliers)
    if robust:
        ok = ok & (Xa[:, 2] < max_range) & (Xb[:, 2] < max_range)
        vals = jnp.where(ok[:, None], disp, jnp.nan)
        T = jnp.nanmedian(vals, axis=0)
        return jnp.nan_to_num(T)
    w = ok.astype(jnp.float32)
    return jnp.sum(disp * w[:, None], 0) / jnp.maximum(jnp.sum(w), 1e-9)


class EssentialResult(NamedTuple):
    H: jnp.ndarray            # (4,4) extrinsic map a->b with metric T
    R: jnp.ndarray
    T: jnp.ndarray
    E: jnp.ndarray
    inliers: jnp.ndarray      # (N,) bool
    n_inliers: jnp.ndarray
    votes: jnp.ndarray        # (4,) cheirality votes


@f32_precision
def essential_scaled_motion(key, uva, uvb, Xa, Xb, valid, rig, *,
                            n_hyps: int = 256, threshold_px: float = 1.0,
                            solver: str = "eight_point"
                            ) -> EssentialResult:
    """Full `extractScaledMotion` capability (`algorithm.py:1501-1583`):

    RANSAC essential estimation on the left-camera pixel tracks (a->b),
    cheirality vote, then metric scale from stereo-triangulated 3D pairs.
    uva/uvb are (N,>=2) pixel tensors (left view in columns 0:2); Xa/Xb
    are the stereo triangulations of the same rows; threshold is in
    pixels like the reference (WindowMatcher: 1 px, simulation: 3 px).

    solver: "eight_point" (default; one batched SVD per hypothesis) or
    "five_point" (the reference's Nister minimal solver via
    `motion.five_point` — w⁵ sample efficiency, so `n_hyps` can be ~5-10×
    smaller for the same confidence at high outlier rates).  Both paths
    refit the winning consensus with the weighted 8-point.
    """
    f = rig.fx
    pp = rig.pp
    xa = (jnp.asarray(uva)[:, :2] - pp) / f               # normalized coords
    xb = (jnp.asarray(uvb)[:, :2] - pp) / f
    thr = threshold_px / f

    if solver == "five_point":
        from front_end_tpu.motion import five_point as fp
        E0, inliers0, _, _ = fp.ransac_five_point(
            key, xa, xb, valid, n_hyps=n_hyps, threshold=thr)
        # weighted 8-point refit on the consensus (keep if not worse)
        E1 = eight_point(xa, xb, inliers0.astype(jnp.float32))
        inliers1 = (sampson_error(E1, xa, xb) < thr) & valid
        better = jnp.sum(inliers1) >= jnp.sum(inliers0)
        E = jnp.where(better, E1, E0)
        inliers = jnp.where(better, inliers1, inliers0)
        n_inl = jnp.sum(inliers)
    else:
        def fit(sub):
            return eight_point(sub[0], sub[1])

        def resid(E, d):
            return sampson_error(E, d[0], d[1])

        def refit(d, w):
            return eight_point(d[0], d[1], w)

        res = ransac_mod.ransac(key, fit, resid, (xa, xb), valid, k=8,
                                n_hyps=n_hyps, threshold=thr,
                                refit_fn=refit)
        E, inliers, n_inl = res.H, res.inliers, res.n_inliers
    R, t, votes = select_cheirality(E, xa, xb, inliers)
    T = estimate_scale(Xa, Xb, R, inliers)
    H = se3.create_homog(R, T)
    return EssentialResult(H=H, R=R, T=T, E=E, inliers=inliers,
                           n_inliers=n_inl, votes=votes)
