"""Parity tests for the production Pallas FAST kernels.

`ops/fast.py` routes TPU detection through
`ops/pallas/fast_kernel.py` (margins + the fused
margins/threshold/NMS detect kernel); these tests pin that exact code:
interpret-mode runs on the CPU mesh assert BIT-identity with the XLA
stencil path for every circle type, NMS mode and per-pixel threshold
map; a `tpu`-marked test runs the compiled kernels on real hardware
(the driver's bench environment).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from front_end_tpu.ops import fast as fast_mod
from front_end_tpu.ops.pallas import fast_kernel


def _image(h=180, w=300, seed=0):
    rs = np.random.RandomState(seed)
    img = np.kron(rs.uniform(0, 255, (h // 6, w // 6)),
                  np.ones((6, 6))).astype(np.float32)
    img += rs.uniform(0, 2, img.shape).astype(np.float32)
    return img[:h, :w]


@pytest.mark.parametrize("fast_type", ["9_16", "7_12", "5_8"])
def test_interpret_margins_bit_identical(fast_type):
    img = jnp.asarray(_image())
    d0, s0 = fast_mod.fast_margins(img, fast_type, backend="xla")
    d1, s1 = fast_kernel.fast_margins_pallas(img, fast_type,
                                             interpret=True)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


@pytest.mark.parametrize("fast_type", ["9_16", "7_12", "5_8"])
@pytest.mark.parametrize("nms", [True, False])
def test_interpret_fused_detect_bit_identical(fast_type, nms):
    img = jnp.asarray(_image(seed=1))
    h, w = img.shape
    # per-cell threshold map like the adaptive grid controller's
    rs = np.random.RandomState(2)
    tm = jnp.asarray(np.kron(rs.uniform(5, 40, (3, 4)).astype(np.float32),
                             np.ones((60, 75), np.float32))[:h, :w])
    d0, s0 = fast_mod.fast_margins(img, fast_type, backend="xla")
    ref = jnp.where(d0 > tm, s0, 0.0)
    if nms:
        ref = fast_mod.nms_cv2(ref)
    got = fast_kernel.fast_detect_pallas(img, tm, fast_type, nms,
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_interpret_batched_matches_singles():
    imgs = jnp.asarray(np.stack([_image(seed=3), _image(seed=4)]))
    got = fast_kernel.fast_detect_pallas(imgs, 15.0, "9_16", True,
                                         interpret=True)
    for b in range(2):
        one = fast_kernel.fast_detect_pallas(imgs[b], 15.0, "9_16", True,
                                             interpret=True)
        np.testing.assert_array_equal(np.asarray(got[b]), np.asarray(one))


def test_vmap_falls_back_to_xla():
    """Under vmap the Pallas path cannot batch; the dispatcher must fall
    back to the XLA stencil and still match."""
    imgs = jnp.asarray(np.stack([_image(seed=5), _image(seed=6)]))
    vm = jax.vmap(lambda im: fast_mod.detect_dense(im, 12.0, "9_16"))
    got = vm(imgs)
    ref = fast_mod.detect_dense(imgs, 12.0, "9_16", backend="xla")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.tpu
def test_compiled_kernels_match_on_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("needs real TPU")
    img = jnp.asarray(_image(seed=7))
    for ft in ("9_16", "7_12", "5_8"):
        d0, s0 = fast_mod.fast_margins(img, ft, backend="xla")
        d1, s1 = fast_kernel.fast_margins_pallas(img, ft)
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
        ref = fast_mod.nms_cv2(jnp.where(d0 > 15.0, s0, 0.0))
        got = fast_kernel.fast_detect_pallas(img, 15.0, ft, True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
