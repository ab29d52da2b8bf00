"""Parity tests for the Pallas streaming match kernel.

`ops/match.py` routes TPU matching through
`ops/pallas/match_kernel.py`; interpret-mode runs assert the kernel's
row/col reductions and every recipe DECISION (valid mask + surviving
train indices + distances) against the XLA matrix path on structured
data where real matches exist.  A `tpu`-marked test runs the compiled
kernel on hardware.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from front_end_tpu.ops import match
from front_end_tpu.ops.pallas import match_kernel
from front_end_tpu.types import Descriptors, Keypoints, Matches


def _pair(nq=384, nt=512, D=256, seed=0, flip=0.04, w=600.0, h=200.0):
    """Train set = shuffled queries with descriptor bit noise + offset
    keypoints, so mutual/Lowe matches genuinely exist."""
    rs = np.random.RandomState(seed)
    bq = (rs.uniform(size=(nq, D)) > 0.5).astype(np.float32)
    perm = rs.permutation(nt) % nq
    bt = bq[perm]
    bt = np.abs(bt - (rs.uniform(size=bt.shape) < flip))
    xyq = np.stack([rs.uniform(50, w - 50, nq),
                    rs.uniform(20, h - 20, nq)], -1).astype(np.float32)
    xyt = xyq[perm] + rs.normal(0, 5, (nt, 2)).astype(np.float32)
    kq = Keypoints(xy=jnp.asarray(xyq), score=jnp.ones((nq,)),
                   angle=jnp.zeros((nq,)),
                   valid=jnp.asarray(rs.uniform(size=nq) > 0.1))
    kt = Keypoints(xy=jnp.asarray(xyt), score=jnp.ones((nt,)),
                   angle=jnp.zeros((nt,)),
                   valid=jnp.asarray(rs.uniform(size=nt) > 0.1))
    return kq, Descriptors(bits=jnp.asarray(bq)), \
        kt, Descriptors(bits=jnp.asarray(bt.astype(np.float32)))


def _assert_matches_equal(a: Matches, b: Matches):
    av, bv = np.asarray(a.valid), np.asarray(b.valid)
    np.testing.assert_array_equal(av, bv)
    assert av.sum() > 20, "vacuous comparison (no matches)"
    np.testing.assert_array_equal(np.asarray(a.train_idx)[av],
                                  np.asarray(b.train_idx)[bv])
    np.testing.assert_array_equal(np.asarray(a.distance)[av],
                                  np.asarray(b.distance)[bv])


def test_interpret_reductions_match_xla():
    kq, dq, kt, dt = _pair()
    d1, d2, i1, cm, ca = match_kernel.match_reduce_pallas(
        dq.bits, dt.bits, kq.xy, kt.xy, kq.valid, kt.valid,
        mode="roi", p1=60.0, tile_j=128, interpret=True)
    dist = (match.hamming_matrix(dq, dt)
            + match.validity_mask(kq.valid, kt.valid)
            + match.roi_mask(kq, kt, 60.0))
    i1r = np.asarray(jnp.argmin(dist, 1))
    d1r = np.asarray(jnp.min(dist, 1))
    ok = d1r < match.BIG / 2
    np.testing.assert_array_equal(np.asarray(i1)[ok], i1r[ok])
    np.testing.assert_array_equal(np.asarray(d1)[ok], d1r[ok])
    lane = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    d2r = np.asarray(jnp.min(
        jnp.where(lane == jnp.asarray(i1r)[:, None], match.BIG, dist), 1))
    np.testing.assert_array_equal(np.asarray(d2)[ok], d2r[ok])
    cmr = np.asarray(jnp.min(dist, 0))
    car = np.asarray(jnp.argmin(dist, 0))
    cok = cmr < match.BIG / 2
    np.testing.assert_array_equal(np.asarray(ca)[cok], car[cok])


def _force_xla(fn):
    """Run a recipe through the XLA matrix path by vmapping (the Pallas
    dispatcher declines batch tracers)."""
    out = jax.vmap(lambda _: fn())(jnp.zeros((1,)))
    return jax.tree.map(lambda a: a[0], out)


@pytest.mark.parametrize("recipe,kw", [
    ("live", dict(epi_threshold=15.0, max_disparity=300.0)),
    ("live", dict(epi_threshold=15.0)),
    ("knn", dict(epi_threshold=15.0)),
    ("interframe", dict(box=40.0)),
])
def test_recipe_decisions_match(monkeypatch, recipe, kw):
    """Force the dispatcher ON in interpret mode and compare decisions
    with the XLA matrix path."""
    kq, dq, kt, dt = _pair(seed=3)

    import front_end_tpu.ops.match as match_mod
    monkeypatch.setattr(match_mod, "_use_pallas_match",
                        lambda *a: True)
    orig = match_kernel.match_reduce_pallas
    monkeypatch.setattr(
        match_kernel, "match_reduce_pallas",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))

    def run():
        if recipe == "live":
            return match.stereo_match_live(kq, dq, kt, dt, **kw)
        if recipe == "knn":
            return match.stereo_match_knn(kq, dq, kt, dt, **kw)
        return match.interframe_match(kq, dq, kt, dt, **kw)

    got = run()
    monkeypatch.setattr(match_mod, "_use_pallas_match",
                        lambda *a: False)
    ref = run()
    _assert_matches_equal(got, ref)


@pytest.mark.tpu
def test_compiled_recipes_match_on_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("needs real TPU")
    kq, dq, kt, dt = _pair(seed=5, nq=512, nt=512)
    got = jax.jit(lambda: match.stereo_match_live(
        kq, dq, kt, dt, epi_threshold=15.0, max_disparity=300.0))()
    ref = jax.jit(lambda: _force_xla(lambda: match.stereo_match_live(
        kq, dq, kt, dt, epi_threshold=15.0, max_disparity=300.0)))()
    _assert_matches_equal(got, ref)
