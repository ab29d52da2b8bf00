import jax
import jax.numpy as jnp
import numpy as np

from front_end_tpu.ops import surf
from front_end_tpu.ops.image import integral_image


def blob_image(h=128, w=160, centers=((40, 50, 6), (80, 110, 10)),
               lo=60.0, hi=200.0):
    """Gaussian blobs — ideal Fast-Hessian responders."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.full((h, w), lo, np.float32)
    for (cy, cx, s) in centers:
        img += (hi - lo) * np.exp(-((yy - cy)**2 + (xx - cx)**2)
                                  / (2 * s * s))
    return img


class TestHessian:
    def test_box_filter_matches_direct_sum(self, rng):
        img = rng.uniform(0, 255, (32, 40)).astype(np.float32)
        ii = integral_image(jnp.asarray(img))
        out = np.array(surf._box(ii, -2, -1, 3, 2))
        # direct: sum over [y-1, y+2) x [x-2, x+3)
        y, x = 10, 17
        ref = img[9:12, 15:20].sum()
        np.testing.assert_allclose(out[y, x], ref, rtol=1e-5)

    def test_hessian_layer_responds_to_blob(self):
        img = blob_image(centers=((64, 80, 8),))
        ii = integral_image(jnp.asarray(img))
        det, trace = surf.hessian_layer(ii, 27)
        d = np.array(det)
        cy, cx = np.unravel_index(np.argmax(d), d.shape)
        assert abs(cy - 64) <= 3 and abs(cx - 80) <= 3
        # bright blob: Laplacian (Dxx+Dyy) negative at centre
        assert np.array(trace)[64, 80] < 0


class TestDetect:
    def test_detects_blobs_at_scale(self):
        img = blob_image()
        det = surf.detect(jnp.asarray(img), hessian_threshold=50.0,
                          max_keypoints=64)
        v = np.array(det.keypoints.valid)
        assert v.sum() >= 2
        xy = np.array(det.keypoints.xy)[v]
        centers = np.array([[50, 40], [110, 80]], np.float32)
        # each blob centre near some detection
        for c in centers:
            assert np.min(np.abs(xy - c).sum(1)) < 6

    def test_bigger_blob_fires_bigger_filter(self):
        img_small = blob_image(centers=((64, 80, 4),))
        img_big = blob_image(centers=((64, 80, 12),))
        ds = surf.detect(jnp.asarray(img_small), hessian_threshold=10.0,
                         max_keypoints=16)
        db = surf.detect(jnp.asarray(img_big), hessian_threshold=10.0,
                         max_keypoints=16)
        s_small = float(ds.size[0])
        s_big = float(db.size[0])
        assert s_big > s_small

    def test_subpixel_recovers_offcenter_blob(self):
        """interpolateKeypoint capability (surf.cpp:229-259): a blob at a
        non-integer centre is localized sub-pixel, beating the integer
        maximum."""
        true = (64.4, 80.7)                     # (y, x)
        img = blob_image(h=128, w=160, centers=((true[0], true[1], 8),))
        ref = surf.detect(jnp.asarray(img), hessian_threshold=50.0,
                          max_keypoints=16, subpix=True)
        raw = surf.detect(jnp.asarray(img), hessian_threshold=50.0,
                          max_keypoints=16, subpix=False)

        def best_err(det):
            v = np.array(det.keypoints.valid)
            xy = np.array(det.keypoints.xy)[v]
            d = np.hypot(xy[:, 0] - true[1], xy[:, 1] - true[0])
            return d.min()

        e_ref, e_raw = best_err(ref), best_err(raw)
        assert e_ref < e_raw + 1e-6
        assert e_ref < 0.35                     # sub-pixel localization
        # refined coords are genuinely fractional
        v = np.array(ref.keypoints.valid)
        xy = np.array(ref.keypoints.xy)[v]
        assert np.abs(xy - np.round(xy)).max() > 1e-3

    def test_jittable(self):
        img = jnp.asarray(blob_image())
        f = jax.jit(lambda im: surf.detect(im, max_keypoints=32))
        det = f(img)
        assert det.keypoints.xy.shape == (32, 2)


class TestDescriptor:
    def test_shapes_and_norm(self):
        img = blob_image()
        xy = jnp.array([[80.0, 64.0], [50.0, 40.0]])
        d64 = surf.describe(jnp.asarray(img), xy)
        d128 = surf.describe(jnp.asarray(img), xy, extended=True)
        assert d64.bits.shape == (2, 64)
        assert d128.bits.shape == (2, 128)
        np.testing.assert_allclose(np.linalg.norm(np.array(d64.bits), axis=1),
                                   1.0, atol=1e-4)

    def test_distinct_points_distinct_descriptors(self, rng):
        img = rng.uniform(0, 255, (128, 160)).astype(np.float32)
        xy = jnp.array([[60.0, 60.0], [100.0, 70.0]])
        d = np.array(surf.describe(jnp.asarray(img), xy).bits)
        assert np.linalg.norm(d[0] - d[1]) > 0.1

    def test_rotation_covariance(self):
        """Descriptor at angle 0 of an image ~ descriptor at angle pi/2 of
        the 90-degree-rotated image (approximately — sampling grids)."""
        img = blob_image(h=128, w=128, centers=((64, 64, 9), (50, 80, 5)))
        p = jnp.array([[64.0, 64.0]])
        d0 = np.array(surf.describe(jnp.asarray(img), p,
                                    angle=jnp.array([0.0])).bits)
        rot = np.rot90(img, k=1).copy()   # (x,y) -> (y, W-1-x)
        d90 = np.array(surf.describe(jnp.asarray(rot), p,
                                     angle=jnp.array([-np.pi / 2])).bits)
        # correlation should be high
        c = float((d0 * d90).sum())
        assert c > 0.7

    def test_upright_ignores_angle(self):
        img = blob_image()
        p = jnp.array([[80.0, 64.0]])
        d1 = np.array(surf.describe(jnp.asarray(img), p,
                                    angle=jnp.array([1.0]), upright=True).bits)
        d2 = np.array(surf.describe(jnp.asarray(img), p,
                                    angle=jnp.array([2.0]), upright=True).bits)
        np.testing.assert_allclose(d1, d2)


class TestOrientation:
    def test_gradient_direction(self):
        # intensity ramp along +x: dominant Haar dx response -> angle ~ 0
        img = np.tile(np.linspace(0, 255, 160, dtype=np.float32), (128, 1))
        ii = integral_image(jnp.asarray(img))
        ang = surf.orientations(ii, jnp.array([[80.0, 64.0]]),
                                jnp.array([9.0]), jnp.array([True]))
        assert abs(float(ang[0])) < 0.3


class TestEndToEnd:
    def test_detect_and_describe(self):
        img = blob_image()
        det, desc = surf.detect_and_describe(jnp.asarray(img),
                                             hessian_threshold=50.0,
                                             max_keypoints=32)
        assert desc.bits.shape == (32, 64)
        assert int(det.keypoints.valid.sum()) >= 2

    def test_matching_under_shift(self):
        """SURF detect+describe on a shifted copy: L2 mutual matching
        must recover the shift (consistency-oracle style)."""
        from front_end_tpu.ops import match as match_mod

        rs = np.random.RandomState(3)
        base = rs.uniform(40, 210, (160, 200)).astype(np.float32)
        from front_end_tpu.ops.image import gaussian_blur
        base = np.array(gaussian_blur(jnp.asarray(base), 2.0))
        imgA = base[:, :180]
        imgB = base[:, 12:192]          # shift by 12 px
        dA, descA = surf.detect_and_describe(jnp.asarray(imgA),
                                             hessian_threshold=5.0,
                                             max_keypoints=64, upright=True)
        dB, descB = surf.detect_and_describe(jnp.asarray(imgB),
                                             hessian_threshold=5.0,
                                             max_keypoints=64, upright=True)
        dist = match_mod.l2sq_matrix(descA.bits, descB.bits)
        dist = dist + match_mod.validity_mask(dA.keypoints.valid,
                                              dB.keypoints.valid)
        m = match_mod.mutual_match(dist)
        v = np.array(m.valid)
        assert v.sum() >= 5
        dx = (np.array(dA.keypoints.xy)[v, 0]
              - np.array(dB.keypoints.xy)[np.array(m.train_idx)[v], 0])
        frac = np.mean(np.abs(dx - 12.0) <= 2.0)
        assert frac > 0.6
