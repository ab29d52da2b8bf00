"""Nister 5-point solver: exact recovery, RANSAC under outliers,
integration with essential_scaled_motion."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from front_end_tpu.geometry.camera import StereoRig
from front_end_tpu.motion import essential, five_point


def _rot(ax, a):
    c, s = np.cos(a), np.sin(a)
    if ax == 0:
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    if ax == 1:
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def _skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]],
                     [-v[1], v[0], 0]])


def _world(rs, n, rmax=0.2):
    R = (_rot(0, rs.uniform(-rmax, rmax)) @ _rot(1, rs.uniform(-rmax, rmax))
         @ _rot(2, rs.uniform(-rmax, rmax)))
    t = rs.uniform(-1, 1, 3)
    t /= np.linalg.norm(t)
    X = rs.uniform(-2, 2, (n, 3))
    X[:, 2] = rs.uniform(4, 10, n)
    xa = X[:, :2] / X[:, 2:3]
    Xb = X @ R.T + t
    xb = Xb[:, :2] / Xb[:, 2:3]
    E = _skew(t) @ R
    return xa, xb, E / np.linalg.norm(E), R, t


def _edist(E, E_true):
    return min(np.linalg.norm(E - E_true), np.linalg.norm(E + E_true))


def test_recovers_true_essential():
    rs = np.random.RandomState(1)
    hits = 0
    for _ in range(6):
        xa, xb, E_true, _, _ = _world(rs, 5)
        res = five_point.five_point_candidates(jnp.asarray(xa),
                                               jnp.asarray(xb))
        E = np.asarray(res.E)
        v = np.asarray(res.valid)
        assert v.sum() >= 1
        best = min(_edist(E[i], E_true) for i in np.where(v)[0])
        hits += best < 1e-2
    assert hits >= 5


def test_candidates_on_essential_manifold():
    rs = np.random.RandomState(2)
    xa, xb, _, _, _ = _world(rs, 5)
    res = five_point.five_point_candidates(jnp.asarray(xa),
                                           jnp.asarray(xb))
    E = np.asarray(res.E)
    for i in np.where(np.asarray(res.valid))[0]:
        s = np.linalg.svd(E[i], compute_uv=False)
        assert s[2] < 1e-4                        # rank 2
        assert abs(s[0] - s[1]) < 1e-3            # equal singular values
        # epipolar constraint on the 5 points
        for j in range(5):
            a = np.append(xa[j], 1.0)
            b = np.append(xb[j], 1.0)
            assert abs(b @ E[i] @ a) < 1e-5


def test_ransac_five_point_under_outliers():
    rs = np.random.RandomState(3)
    xa, xb, E_true, _, _ = _world(rs, 120)
    # 30% outliers
    n_out = 36
    xb = xb.copy()
    xb[:n_out] += rs.uniform(-0.3, 0.3, (n_out, 2))
    valid = jnp.ones((120,), bool)
    key = jax.random.PRNGKey(0)
    E, inliers, n_inl, _ = five_point.ransac_five_point(
        key, jnp.asarray(xa), jnp.asarray(xb), valid,
        n_hyps=48, threshold=1e-3)
    inl = np.asarray(inliers)
    assert int(n_inl) >= 70
    assert inl[n_out:].mean() > 0.85              # real inliers kept
    assert inl[:n_out].mean() < 0.15              # outliers rejected
    assert _edist(np.asarray(E), E_true) < 0.05


def test_essential_scaled_motion_five_point_solver():
    rs = np.random.RandomState(4)
    rig = StereoRig.create(fx=300.0, cx=160.0, cy=120.0, baseline=0.5,
                           width=320, height=240)
    n = 150
    R = _rot(1, 0.04) @ _rot(2, 0.02)
    t = np.array([0.2, -0.05, 0.6])
    X = rs.uniform(-2, 2, (n, 3))
    X[:, 2] = rs.uniform(4, 12, n)
    Xb = X @ R.T + t
    uva = X[:, :2] / X[:, 2:3] * 300.0 + np.array([160.0, 120.0])
    uvb = Xb[:, :2] / Xb[:, 2:3] * 300.0 + np.array([160.0, 120.0])
    valid = jnp.ones((n,), bool)
    res = essential.essential_scaled_motion(
        jax.random.PRNGKey(1), jnp.asarray(uva), jnp.asarray(uvb),
        jnp.asarray(X), jnp.asarray(Xb), valid, rig,
        n_hyps=32, threshold_px=1.0, solver="five_point")
    assert int(res.n_inliers) > 100
    np.testing.assert_allclose(np.asarray(res.R), R, atol=0.02)
    np.testing.assert_allclose(np.asarray(res.T), t, atol=0.05)


def test_jit_and_vmap_compatible():
    rs = np.random.RandomState(5)
    sets_a, sets_b = [], []
    for _ in range(4):
        xa, xb, _, _, _ = _world(rs, 5)
        sets_a.append(xa)
        sets_b.append(xb)
    A = jnp.asarray(np.stack(sets_a))
    B = jnp.asarray(np.stack(sets_b))
    f = jax.jit(jax.vmap(five_point.five_point_candidates))
    res = f(A, B)
    assert res.E.shape == (4, five_point.MAX_ROOTS, 3, 3)
    assert bool(res.valid.any())
