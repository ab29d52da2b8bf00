"""BRISK and FREAK: pattern sanity, detection, shift-matching tests."""
import numpy as np
import pytest

from front_end_tpu.ops import brisk, freak
from front_end_tpu.ops import fast as fast_mod
from front_end_tpu.types import Keypoints

import jax
import jax.numpy as jnp


def blobs(h=96, w=128, seed=0, n=45):
    rs = np.random.RandomState(seed)
    img = np.full((h, w), 128.0, np.float32)
    for _ in range(n):
        y, x = rs.randint(14, h - 22), rs.randint(14, w - 22)
        s = rs.randint(4, 10)
        img[y:y + s, x:x + s] = rs.uniform(20, 235)
    return img


def test_brisk_pattern_static():
    pts, ring_id, short, long = brisk._pattern()
    assert pts.shape == (brisk.N_POINTS, 2)
    assert short.shape == (512, 2)
    assert len(long) > 100
    d_short = np.linalg.norm(pts[short[:, 0]] - pts[short[:, 1]], axis=1)
    d_long = np.linalg.norm(pts[long[:, 0]] - pts[long[:, 1]], axis=1)
    assert d_short.max() <= d_long.min() + 1e-5 or \
        d_short.mean() < d_long.mean()


def test_brisk_detect_on_blobs():
    img = blobs()
    det = brisk.detect(img, threshold=25.0, n_octaves=2, max_keypoints=128)
    assert int(det.keypoints.count) >= 10


def _match_rate(img, det_fn, shift=5):
    shifted = np.roll(img, shift, axis=1)
    det_a, da = det_fn(img)
    det_b, db = det_fn(shifted)
    a_xy = np.asarray(det_a.xy)
    b_xy = np.asarray(det_b.xy)
    va, vb = np.asarray(det_a.valid), np.asarray(det_b.valid)
    da, db = np.asarray(da.bits), np.asarray(db.bits)
    good = total = 0
    for i in np.where(va)[0]:
        tgt = a_xy[i] + np.array([shift, 0.0])
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
    return good, total


def test_brisk_descriptor_matches_under_shift():
    img = blobs(seed=2)

    def run(im):
        det, desc = brisk.detect_and_describe(
            im, threshold=25.0, n_octaves=2, max_keypoints=96)
        return det.keypoints, desc
    good, total = _match_rate(img, run)
    assert total >= 10
    assert good / total > 0.6


def _fast_keypoints(img, k=96):
    # tie-breaking NMS: on synthetic blocks cv2's tie-annihilating
    # suppression (detect_dense nms=True) would kill the equal-score
    # square corners; this helper only needs a stable keypoint set.
    s = fast_mod.nms3x3(
        fast_mod.detect_dense(jnp.asarray(img), 25.0, nms=False))
    h, w = s.shape
    v, idx = jax.lax.top_k(s.reshape(-1), k)
    xy = jnp.stack([(idx % w).astype(jnp.float32),
                    (idx // w).astype(jnp.float32)], -1)
    # keep pattern inside the image
    border = 18.0
    inside = ((xy[:, 0] >= border) & (xy[:, 0] < w - border)
              & (xy[:, 1] >= border) & (xy[:, 1] < h - border))
    return Keypoints(xy=xy, score=v, angle=jnp.zeros((k,)),
                     valid=(v > 0) & inside)


def test_freak_descriptor_matches_under_shift():
    img = blobs(seed=4)

    def run(im):
        kps = _fast_keypoints(im)
        kps, desc = freak.describe_keypoints(jnp.asarray(im), kps)
        return kps, desc
    good, total = _match_rate(img, run)
    assert total >= 10
    assert good / total > 0.6


def test_freak_bits_binary():
    img = blobs(seed=5)
    kps = _fast_keypoints(img, k=32)
    _, desc = freak.describe_keypoints(jnp.asarray(img), kps)
    bits = np.asarray(desc.bits)
    assert bits.shape == (32, 512)
    assert set(np.unique(bits)).issubset({0.0, 1.0})


def test_freak_orientation_rotates_with_image():
    # a simple oriented gradient: orientation should follow a 90° rotation
    img = np.tile(np.linspace(0, 255, 96, dtype=np.float32), (96, 1))
    kp = Keypoints(xy=jnp.asarray([[48.0, 48.0]]),
                   score=jnp.asarray([1.0]), angle=jnp.asarray([0.0]),
                   valid=jnp.asarray([True]))
    a0 = float(freak.orientations(jnp.asarray(img), kp.xy, kp.valid)[0])
    a90 = float(freak.orientations(jnp.asarray(np.rot90(img).copy()),
                                   kp.xy, kp.valid)[0])
    diff = np.abs(np.arctan2(np.sin(a0 - a90), np.cos(a0 - a90)))
    assert 1.2 < diff < 2.0  # ~π/2
