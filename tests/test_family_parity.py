"""Family-level cross-implementation oracles (VERDICT r5 #2).

The reference's own verification pattern is independent-implementation
comparison (SURVEY §4.2: its Nister vs cv2.findEssentialMat).  Here each
descriptor family runs detect+describe+match on a rendered rectified
stereo pair with known epipolar geometry, and its epipolar-inlier match
rate is bounded against an INDEPENDENT cv2 implementation on the same
images:

- ORB, SIFT: same-family oracles (cv2 5.0 on this machine ships only
  ORB and SIFT; BRISK/AKAZE/xfeatures2d were dropped from its build);
- BRISK, AKAZE: bounded against the cv2-ORB rate on identical geometry
  — an independent-implementation calibration bar that bounds the
  documented MLDB approximations (ops/akaze.py module doc) and BRISK
  pattern fidelity with evidence instead of self-consistency.

Measured rates at the time of writing (assertion messages carry the
live values): cv2 ORB 0.930, mine 0.955; cv2 SIFT 0.940, mine 0.881;
mine BRISK 0.964; mine AKAZE 0.966.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from front_end_tpu.geometry.camera import StereoRig
from front_end_tpu.sim import render

cv2 = pytest.importorskip("cv2")

MAX_DISP = 60.0
EPI_PX = 1.5


@pytest.fixture(scope="module")
def stereo_pair():
    rng = np.random.RandomState(7)
    rig = StereoRig.create(fx=200.0, cx=127.5, cy=95.5, baseline=0.3,
                           width=256, height=192)
    scene = render.corridor_scene(rng, tex_size=384)
    gt = render.corridor_trajectory(3)
    lefts, rights = render.render_stereo_sequence(scene, rig, gt)
    return lefts[2], rights[2]


def nn_ratio_match(dl, dr, metric, ratio=0.8):
    """Mutual-NN + Lowe ratio — one shared host matcher so both
    implementations are scored by the identical rule."""
    if len(dl) == 0 or len(dr) < 2:
        return np.zeros((0, 2), int)
    if metric == "hamming":
        a, b = dl.astype(np.float32), dr.astype(np.float32)
        D = a @ (1 - b.T) + (1 - a) @ b.T
    else:
        D = ((dl[:, None, :] - dr[None, :, :]) ** 2).sum(-1)
    i2 = np.argsort(D, axis=1)[:, :2]
    best = D[np.arange(len(dl)), i2[:, 0]]
    second = D[np.arange(len(dl)), i2[:, 1]]
    ok = best < ratio * np.maximum(second, 1e-9)
    back = np.argmin(D, axis=0)
    ok &= back[i2[:, 0]] == np.arange(len(dl))
    return np.stack([np.arange(len(dl))[ok], i2[ok, 0]], -1)


def epi_inlier_rate(xyl, xyr, pairs):
    """Rectified-pair geometric check: matched rows, positive bounded
    disparity."""
    if len(pairs) == 0:
        return 0.0, 0
    pl, pr = xyl[pairs[:, 0]], xyr[pairs[:, 1]]
    dv = np.abs(pl[:, 1] - pr[:, 1])
    du = pl[:, 0] - pr[:, 0]
    inl = (dv <= EPI_PX) & (du > 0.5) & (du < MAX_DISP)
    return float(inl.mean()), len(pairs)


def _run_mine(fam, L, R):
    if fam == "ORB":
        from front_end_tpu.ops import orb
        fn = lambda im: orb.detect_describe_pyramid(
            jnp.asarray(im, jnp.float32))
        metric = "hamming"
    elif fam == "BRISK":
        from front_end_tpu.ops import brisk
        fn = lambda im: brisk.detect_and_describe(
            jnp.asarray(im, jnp.float32))
        metric = "hamming"
    elif fam == "AKAZE":
        from front_end_tpu.ops import akaze
        fn = lambda im: akaze.detect_and_describe(
            jnp.asarray(im, jnp.float32))
        metric = "hamming"
    else:
        from front_end_tpu.ops import sift
        fn = lambda im: sift.detect_and_describe(
            jnp.asarray(im, jnp.float32))
        metric = "l2"
    outs = []
    for im in (L, R):
        det, desc = fn(im)
        v = np.asarray(det.keypoints.valid)
        outs.append((np.asarray(det.keypoints.xy)[v],
                     np.asarray(desc.bits)[v]))
    (xyl, dl), (xyr, dr) = outs
    return epi_inlier_rate(xyl, xyr, nn_ratio_match(dl, dr, metric))


def _run_cv2(maker, metric, L, R):
    outs = []
    for im in (L, R):
        kps, desc = maker.detectAndCompute(im.astype(np.uint8), None)
        assert desc is not None and len(kps) > 10
        xy = np.array([k.pt for k in kps], np.float32)
        d = (desc.astype(np.float32) if metric == "l2"
             else np.unpackbits(desc, axis=1))
        outs.append((xy, d))
    (xyl, dl), (xyr, dr) = outs
    return epi_inlier_rate(xyl, xyr, nn_ratio_match(dl, dr, metric))


@pytest.mark.slow
class TestFamilyParity:
    def test_orb_same_family(self, stereo_pair):
        L, R = stereo_pair
        r_cv, n_cv = _run_cv2(cv2.ORB_create(nfeatures=1024), "hamming",
                              L, R)
        r_my, n_my = _run_mine("ORB", L, R)
        assert n_my >= 100 and n_cv >= 100, (n_my, n_cv)
        assert r_my >= 0.85 * r_cv, (
            f"ORB inlier rate {r_my:.3f} ({n_my} matches) vs cv2 "
            f"{r_cv:.3f} ({n_cv})")

    def test_sift_same_family(self, stereo_pair):
        L, R = stereo_pair
        r_cv, n_cv = _run_cv2(cv2.SIFT_create(nfeatures=1024), "l2", L, R)
        r_my, n_my = _run_mine("SIFT", L, R)
        assert n_my >= 25 and n_cv >= 25, (n_my, n_cv)
        assert r_my >= 0.85 * r_cv, (
            f"SIFT inlier rate {r_my:.3f} ({n_my} matches) vs cv2 "
            f"{r_cv:.3f} ({n_cv})")

    def test_brisk_vs_independent_bar(self, stereo_pair):
        """cv2 5.0 has no BRISK: bound against the cv2-ORB rate on the
        SAME geometry (measured: BRISK 0.964 vs bar 0.930)."""
        L, R = stereo_pair
        bar, n_bar = _run_cv2(cv2.ORB_create(nfeatures=1024), "hamming",
                              L, R)
        r_my, n_my = _run_mine("BRISK", L, R)
        assert n_my >= 80, n_my
        assert r_my >= 0.9 * bar, (
            f"BRISK inlier rate {r_my:.3f} ({n_my} matches) vs cv2-ORB "
            f"bar {bar:.3f} ({n_bar})")

    @pytest.mark.parametrize("fam,metric,measured", [
        ("BRIEF", "hamming", 0.978),
        ("FREAK", "hamming", 0.964),
        ("SURF", "l2", 0.959),
    ])
    def test_descriptor_families_vs_independent_bar(self, stereo_pair,
                                                    fam, metric,
                                                    measured):
        """The remaining live descriptor swap set (BRIEF/FREAK/SURF —
        none present in this cv2 build; SURF has no cv2 counterpart
        anywhere since xfeatures2d) bounded against the cv2-ORB rate on
        identical geometry, using the production grid-FAST detector.
        Measured rates at time of writing are in the parametrization."""
        from front_end_tpu import features as features_mod
        from front_end_tpu.ops import grid as grid_mod
        import jax.numpy as jnp

        L, R = stereo_pair
        bar, n_bar = _run_cv2(cv2.ORB_create(nfeatures=1024), "hamming",
                              L, R)
        cfg = grid_mod.GridConfig(grid_rows=2, grid_cols=3,
                                  cell_capacity=128, set_point=700,
                                  init_threshold=12.0)
        ids = features_mod.ids_for(fam,
                                   features_mod.descriptor_table())
        fn, ok = features_mod.make_descriptor(ids[0])
        assert ok
        outs = []
        for im in (L, R):
            det = grid_mod.detect(jnp.asarray(im),
                                  cfg.init_thresholds(), cfg)
            v = np.asarray(det.keypoints.valid)
            xy = np.asarray(det.keypoints.xy)
            d = fn(jnp.asarray(im, np.float32), jnp.asarray(xy))
            outs.append((xy[v], np.asarray(d.bits)[v]))
        (xyl, dl), (xyr, dr) = outs
        r_my, n_my = epi_inlier_rate(xyl, xyr,
                                     nn_ratio_match(dl, dr, metric))
        assert n_my >= 80, n_my
        assert r_my >= 0.9 * bar, (
            f"{fam} inlier rate {r_my:.3f} ({n_my} matches) vs cv2-ORB "
            f"bar {bar:.3f} ({n_bar})")

    def test_akaze_vs_independent_bar(self, stereo_pair):
        """Bounds the documented MLDB approximations (per-cell means
        from a fixed sample grid, same-octave extrema — ops/akaze.py):
        matching quality must stay at the independent cv2-ORB bar
        (measured: AKAZE 0.966 vs bar 0.930)."""
        L, R = stereo_pair
        bar, n_bar = _run_cv2(cv2.ORB_create(nfeatures=1024), "hamming",
                              L, R)
        r_my, n_my = _run_mine("AKAZE", L, R)
        assert n_my >= 60, n_my
        assert r_my >= 0.9 * bar, (
            f"AKAZE inlier rate {r_my:.3f} ({n_my} matches) vs cv2-ORB "
            f"bar {bar:.3f} ({n_bar})")
