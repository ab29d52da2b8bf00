import jax
import jax.numpy as jnp
import numpy as np

from front_end_tpu.ops import sift
from tests.test_surf import blob_image


class TestPyramid:
    def test_shapes(self):
        img = jnp.asarray(blob_image(128, 160))
        pyr = sift.build_pyramid(img, 3)
        assert len(pyr) == 3
        assert pyr[0].shape == (6, 128, 160)
        assert pyr[1].shape == (6, 64, 80)
        assert pyr[2].shape == (6, 32, 40)

    def test_increasing_blur(self):
        img = jnp.asarray(np.random.RandomState(0)
                          .uniform(0, 255, (64, 64)).astype(np.float32))
        pyr = sift.build_pyramid(img, 1)
        # variance decreases with blur level
        vs = [float(jnp.var(pyr[0][i])) for i in range(6)]
        assert all(vs[i] > vs[i + 1] for i in range(5))


class TestDetect:
    def test_detects_blobs(self):
        # blob sigmas chosen to peak mid-octave (a blob whose DoG maximum
        # lands exactly on an octave boundary is legitimately missed by
        # the 3x3x3 in-octave extremum test)
        img = blob_image(centers=((40, 50, 3), (80, 110, 7)))
        det = sift.detect(jnp.asarray(img), max_keypoints=128,
                          contrast_threshold=0.015)
        v = np.array(det.keypoints.valid)
        assert v.sum() >= 2
        xy = np.array(det.keypoints.xy)[v]
        for c in np.array([[50, 40], [110, 80]], np.float32):
            assert np.min(np.abs(xy - c).sum(1)) < 5

    def test_scale_assignment(self):
        small = blob_image(centers=((64, 80, 3),))
        big = blob_image(centers=((64, 80, 12),))
        ds = sift.detect(jnp.asarray(small), max_keypoints=8)
        db = sift.detect(jnp.asarray(big), max_keypoints=8)
        assert float(db.sigma[0]) > float(ds.sigma[0])

    def test_flat_image_no_detections(self):
        img = jnp.full((96, 96), 100.0)
        det = sift.detect(img, max_keypoints=32)
        assert int(det.keypoints.valid.sum()) == 0


class TestDescriptor:
    def test_shape_and_norm(self):
        img = blob_image()
        xy = jnp.array([[80.0, 64.0], [50.0, 40.0]])
        d = sift.describe(jnp.asarray(img), xy, jnp.array([2.0, 2.0]),
                          jnp.array([0.0, 0.0]))
        assert d.bits.shape == (2, 128)
        n = np.linalg.norm(np.array(d.bits), axis=1)
        np.testing.assert_allclose(n, 1.0, atol=1e-4)
        # pre-renormalization clipping keeps any one bin from dominating
        assert np.array(d.bits).max() <= 0.5

    def test_orientation_ramp(self):
        img = np.tile(np.linspace(0, 255, 160, dtype=np.float32), (128, 1))
        ang = sift.orientations(jnp.asarray(img), jnp.array([[80.0, 64.0]]),
                                jnp.array([2.0]), jnp.array([True]))
        assert abs(float(ang[0])) < 0.3

    def test_matching_under_shift(self):
        from front_end_tpu.ops import match as match_mod
        from front_end_tpu.ops.image import gaussian_blur

        rs = np.random.RandomState(5)
        base = np.array(gaussian_blur(
            jnp.asarray(rs.uniform(10, 245, (160, 220)).astype(np.float32)),
            1.2))
        A, B = base[:, :192], base[:, 15:207]
        da, qa = sift.detect_and_describe(jnp.asarray(A), max_keypoints=96,
                                          contrast_threshold=0.01)
        db, qb = sift.detect_and_describe(jnp.asarray(B), max_keypoints=96,
                                          contrast_threshold=0.01)
        dist = match_mod.l2sq_matrix(qa.bits, qb.bits)
        dist = dist + match_mod.validity_mask(da.keypoints.valid,
                                              db.keypoints.valid)
        m = match_mod.mutual_match(dist)
        v = np.array(m.valid)
        assert v.sum() >= 8
        dx = (np.array(da.keypoints.xy)[v, 0]
              - np.array(db.keypoints.xy)[np.array(m.train_idx)[v], 0])
        assert np.mean(np.abs(dx - 15.0) <= 2.5) > 0.6
