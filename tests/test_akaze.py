"""AKAZE: FED scale space, detection, and MLDB/M-SURF descriptor tests."""
import numpy as np
import pytest

import jax.numpy as jnp

from front_end_tpu.ops import akaze


def checkerboard(h=96, w=128, sq=12, lo=40.0, hi=210.0):
    ys, xs = np.mgrid[0:h, 0:w]
    img = np.where(((ys // sq) + (xs // sq)) % 2 == 0, lo, hi)
    return img.astype(np.float32)


def blobs(h=96, w=128, seed=0, n=40):
    rs = np.random.RandomState(seed)
    img = np.full((h, w), 128.0, np.float32)
    for _ in range(n):
        y, x = rs.randint(8, h - 16), rs.randint(8, w - 16)
        s = rs.randint(4, 10)
        img[y:y + s, x:x + s] = rs.uniform(20, 235)
    return img


def test_fed_tau_sums_to_time():
    for T in (0.5, 2.0, 7.3):
        taus = akaze.fed_tau_by_process_time(T)
        assert np.isclose(taus.sum(), T, rtol=1e-5)
        assert (taus > 0).all()


def test_diffusion_preserves_mean_and_smooths():
    img = blobs()
    evo = akaze.nonlinear_scale_space(img, n_octaves=1, n_sublevels=4)
    first, last = np.asarray(evo[0].lt), np.asarray(evo[-1].lt)
    # diffusion conserves mass approximately and reduces variance
    assert abs(first.mean() - last.mean()) < 0.01
    assert last.var() < first.var()


def test_conductivity_low_at_edges():
    g = akaze.conductivity(jnp.asarray([0.0, 1.0]), jnp.asarray([0.0, 0.0]),
                           k=0.1, kind="pm_g2")
    assert float(g[0]) == pytest.approx(1.0)
    assert float(g[1]) < 0.05


def test_detect_finds_blobs():
    img = checkerboard()
    det = akaze.detect(img, n_octaves=2, n_sublevels=2, max_keypoints=128)
    kps = det.keypoints
    n = int(kps.count)
    assert n >= 8
    xy = np.asarray(kps.xy)[np.asarray(kps.valid)]
    # det-Hessian is a blob detector: maxima at square CENTRES
    # (sq/2 + k*sq on each axis)
    res = (xy - 6.0) % 12.0
    res = np.minimum(res, 12.0 - res)
    assert np.median(res) < 3.0


@pytest.mark.parametrize("descriptor", ["mldb", "msurf"])
def test_descriptors_match_under_shift(descriptor):
    img = blobs(seed=3)
    shifted = np.roll(img, 5, axis=1)
    det_a, desc_a = akaze.detect_and_describe(
        img, n_octaves=2, n_sublevels=2, max_keypoints=96,
        descriptor=descriptor)
    det_b, desc_b = akaze.detect_and_describe(
        shifted, n_octaves=2, n_sublevels=2, max_keypoints=96,
        descriptor=descriptor)
    a_xy = np.asarray(det_a.keypoints.xy)
    b_xy = np.asarray(det_b.keypoints.xy)
    va = np.asarray(det_a.keypoints.valid)
    vb = np.asarray(det_b.keypoints.valid)
    da = np.asarray(desc_a.bits)
    db = np.asarray(desc_b.bits)

    # for each valid kp in a, find the geometrically-true partner in b
    good = total = 0
    for i in np.where(va)[0]:
        tgt = a_xy[i] + np.array([5.0, 0.0])
        d_geo = np.linalg.norm(b_xy - tgt, axis=1)
        d_geo[~vb] = 1e9
        j = np.argmin(d_geo)
        if d_geo[j] > 2.0:
            continue
        total += 1
        d_desc = np.linalg.norm(db - da[i], axis=1)
        d_desc[~vb] = 1e9
        if np.argmin(d_desc) == j:
            good += 1
    assert total >= 10
    assert good / total > 0.6


def test_mldb_bits_binary_and_padded():
    img = blobs(seed=1)
    det, desc = akaze.detect_and_describe(
        img, n_octaves=1, n_sublevels=2, max_keypoints=64)
    bits = np.asarray(desc.bits)
    assert bits.shape[-1] == akaze.MLDB_PADDED
    assert set(np.unique(bits)).issubset({0.0, 1.0})
    # pad bits always zero
    assert (bits[:, akaze.MLDB_BITS:] == 0).all()
