"""Parity tests for the production Pallas BRIEF kernel.

`pipeline/vo.py` routes backend==tpu descriptor work through
`ops/pallas/brief_kernel.py`; these tests pin that exact code:
interpret-mode runs on the CPU mesh assert bit-identity with the XLA
dense path (`brief.describe_dense`) and with the per-keypoint gather
reference (`brief.describe`); a `tpu`-marked test runs the compiled
kernel when real hardware is present (the driver's bench environment).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from front_end_tpu.ops import brief as brief_mod
from front_end_tpu.ops.pallas import brief_kernel


def _image(h=200, w=300, seed=0):
    rs = np.random.RandomState(seed)
    img = np.full((h, w), 120.0, np.float32)
    for _ in range(260):
        y, x = rs.randint(0, h - 14), rs.randint(0, w - 14)
        s = rs.randint(3, 13)
        img[y:y + s, x:x + s] = rs.uniform(5, 250)
    return img


def _keypoints(h, w, n=64, seed=1):
    rs = np.random.RandomState(seed)
    b = brief_mod.PATCH // 2 + brief_mod.SMOOTH
    return np.stack([rs.uniform(b, w - b, n),
                     rs.uniform(b, h - b, n)], -1).astype(np.float32)


@pytest.mark.parametrize("n_bytes", [16, 32, 64])
def test_interpret_parity_with_dense_and_gather(n_bytes):
    img = _image()
    h, w = img.shape
    sm = brief_mod.smooth(jnp.asarray(img))
    xy = jnp.asarray(_keypoints(h, w))

    ref_dense = brief_mod.describe_dense(sm, xy, n_bytes)
    ref_gather = brief_mod.describe(sm, xy, n_bytes)
    got = brief_kernel.describe_dense_pallas(sm, xy, n_bytes,
                                             interpret=True)

    np.testing.assert_array_equal(np.asarray(got.packed),
                                  np.asarray(ref_dense.packed))
    np.testing.assert_array_equal(np.asarray(got.bits),
                                  np.asarray(ref_gather.bits))


def test_interpret_pair_matches_singles():
    img_l, img_r = _image(seed=2), _image(seed=3)
    h, w = img_l.shape
    sml = brief_mod.smooth(jnp.asarray(img_l))
    smr = brief_mod.smooth(jnp.asarray(img_r))
    xyl = jnp.asarray(_keypoints(h, w, seed=4))
    xyr = jnp.asarray(_keypoints(h, w, seed=5))

    dl, dr = brief_kernel.describe_pair_pallas(sml, smr, xyl, xyr, 32,
                                               interpret=True)
    sl = brief_kernel.describe_dense_pallas(sml, xyl, 32, interpret=True)
    sr = brief_kernel.describe_dense_pallas(smr, xyr, 32, interpret=True)
    np.testing.assert_array_equal(np.asarray(dl.packed),
                                  np.asarray(sl.packed))
    np.testing.assert_array_equal(np.asarray(dr.packed),
                                  np.asarray(sr.packed))


def test_interpret_non_tile_aligned_shape():
    """Image smaller than one tile and not lane-aligned still matches."""
    img = _image(h=97, w=153, seed=6)
    sm = brief_mod.smooth(jnp.asarray(img))
    xy = jnp.asarray(_keypoints(97, 153, n=16, seed=7))
    ref = brief_mod.describe_dense(sm, xy, 16)
    got = brief_kernel.describe_dense_pallas(sm, xy, 16, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.packed),
                                  np.asarray(ref.packed))


@pytest.mark.tpu
def test_compiled_kernel_parity_on_tpu():
    """The real compiled kernel (requires TPU; skipped on the CPU mesh)."""
    if jax.default_backend() != "tpu":
        pytest.skip("needs real TPU hardware")
    img = _image(h=376, w=1241, seed=8)
    sm = brief_mod.smooth(jnp.asarray(img))
    xy = jnp.asarray(_keypoints(376, 1241, n=512, seed=9))
    ref = brief_mod.describe_dense(sm, xy, 32)
    got = brief_kernel.describe_dense_pallas(sm, xy, 32)
    np.testing.assert_array_equal(np.asarray(got.packed),
                                  np.asarray(ref.packed))
