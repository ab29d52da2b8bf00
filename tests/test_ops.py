import jax
import jax.numpy as jnp
import numpy as np
import pytest

from front_end_tpu.ops import brief, fast, grid, image as image_ops, match, orb, subpix
from front_end_tpu import types


# ---------------------------------------------------------------- helpers
def checkerboard(h=128, w=160, sq=16, lo=40.0, hi=200.0):
    yy, xx = np.mgrid[0:h, 0:w]
    board = (((yy // sq) + (xx // sq)) % 2).astype(np.float32)
    return board * (hi - lo) + lo


def textured_image(h=192, w=256, seed=0, n_blobs=60):
    """Random bright/dark squares on a gray background -> corner-rich."""
    rs = np.random.RandomState(seed)
    img = np.full((h, w), 128.0, np.float32)
    for _ in range(n_blobs):
        y, x = rs.randint(10, h - 20), rs.randint(10, w - 20)
        s = rs.randint(4, 14)
        v = rs.choice([30.0, 220.0])
        img[y:y + s, x:x + s] = v
    return img


def naive_fast_score(img, circle, K):
    """Reference implementation of the dense margin score (numpy loops)."""
    h, w = img.shape
    n = len(circle)
    score = np.zeros((h, w), np.float32)
    r = max(max(abs(dx), abs(dy)) for dx, dy in circle)
    for y in range(r, h - r):
        for x in range(r, w - r):
            c = img[y, x]
            d = np.array([img[y + dy, x + dx] - c for dx, dy in circle])
            best = 0.0
            for s in range(n):
                idx = [(s + j) % n for j in range(K)]
                best = max(best, min(-d[idx]), min(d[idx]))
            score[y, x] = best
    return score


# ---------------------------------------------------------------- image ops
class TestImageOps:
    def test_integral_image(self, rng):
        img = rng.uniform(0, 255, (20, 30)).astype(np.float32)
        ii = np.array(image_ops.integral_image(jnp.asarray(img)))
        s = ii[15, 25] - ii[5, 25] - ii[15, 10] + ii[5, 10]
        np.testing.assert_allclose(s, img[5:15, 10:25].sum(), rtol=1e-5)

    def test_box_blur_interior(self):
        img = np.zeros((21, 21), np.float32)
        img[10, 10] = 81.0
        out = np.array(image_ops.box_blur(jnp.asarray(img), 9))
        np.testing.assert_allclose(out[10, 10], 1.0, rtol=1e-5)
        np.testing.assert_allclose(out[6:15, 6:15].sum(), 81.0, rtol=1e-4)

    def test_shift2d(self):
        img = jnp.arange(12.0).reshape(3, 4)
        out = np.array(image_ops.shift2d(img, 1, 0))
        np.testing.assert_allclose(out[0], np.array(img)[1])

    def test_bilinear_sample(self):
        img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
        v = np.array(image_ops.bilinear_sample(
            img, jnp.array([[1.5, 0.5], [2.0, 1.0]])))
        np.testing.assert_allclose(v, [3.5, 6.0], atol=1e-5)

    def test_extract_patches(self):
        img = jnp.asarray(np.arange(100, dtype=np.float32).reshape(10, 10))
        p = np.array(image_ops.extract_patches(img, jnp.array([[5.0, 4.0]]), 3))
        np.testing.assert_allclose(p[0], np.array(img)[3:6, 4:7])


# ---------------------------------------------------------------- FAST
class TestFast:
    @pytest.mark.parametrize("ftype", ["9_16", "7_12"])
    def test_score_matches_naive(self, ftype):
        img = textured_image(48, 64, seed=1, n_blobs=10)
        circle, K = fast.TYPES[ftype]
        ours = np.array(fast.fast_score_map(jnp.asarray(img), ftype))
        ref = naive_fast_score(img, circle, K)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_detects_square_corners(self):
        # nms=False: on a noise-free square every corner pixel ties its
        # neighbours and cv2-exact NMS (ties annihilate) suppresses all
        # of them — exactly what cv2 does on this image.
        img = np.full((64, 64), 50.0, np.float32)
        img[20:40, 20:40] = 200.0
        s = np.array(fast.detect_dense(jnp.asarray(img), 20.0, nms=False))
        ys, xs = np.nonzero(s)
        assert len(ys) >= 4
        # all detections near the 4 corners of the square
        corners = np.array([[20, 20], [20, 39], [39, 20], [39, 39]])
        for y, x in zip(ys, xs):
            assert np.min(np.abs(corners - [y, x]).sum(1)) <= 4

    def test_nms_isolates_maxima(self):
        img = textured_image(96, 128, seed=2)
        s = np.array(fast.detect_dense(jnp.asarray(img), 15.0, nms=True))
        ys, xs = np.nonzero(s)
        pts = set(zip(ys.tolist(), xs.tolist()))
        for y, x in pts:
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if (dy or dx) and (y + dy, x + dx) in pts:
                        raise AssertionError("adjacent survivors after NMS")

    def test_threshold_monotonicity(self):
        img = textured_image(96, 128, seed=3)
        n1 = (np.array(fast.detect_dense(jnp.asarray(img), 10.0)) > 0).sum()
        n2 = (np.array(fast.detect_dense(jnp.asarray(img), 40.0)) > 0).sum()
        assert n1 >= n2


# ---------------------------------------------------------------- grid
class TestGrid:
    def test_detect_returns_static_capacity(self):
        cfg = grid.GridConfig(cell_capacity=64, set_point=600)
        img = jnp.asarray(textured_image(192, 258, seed=4))
        det = grid.detect(img, cfg.init_thresholds(), cfg)
        assert det.keypoints.xy.shape == (cfg.capacity, 2)
        assert int(det.keypoints.count) > 0
        v = np.array(det.keypoints.valid)
        sc = np.array(det.keypoints.score)
        assert (sc[v] > 0).all()

    def test_controller_tracks_set_point(self):
        # graded-contrast blobs so detection counts respond to threshold
        rs = np.random.RandomState(13)
        img = np.full((192, 258), 128.0, np.float32)
        for _ in range(150):
            y, x = rs.randint(10, 170), rs.randint(10, 240)
            s = rs.randint(4, 12)
            img[y:y + s, x:x + s] = rs.uniform(10, 245)

        cfg = grid.GridConfig(cell_capacity=256, set_point=420,
                              init_threshold=70.0)
        t = cfg.init_thresholds()
        f = jax.jit(lambda im, th: grid.detect(im, th, cfg))
        im = jnp.asarray(img)
        c0 = int(f(im, t).cell_counts.sum())
        for _ in range(70):
            t = f(im, t).thresholds
        det = f(im, t)
        c1 = int(det.cell_counts.sum())
        # too few detections at t=70 -> controller lowers thresholds and
        # the detection count rises toward the set-point
        assert c1 > c0
        assert np.array(t).max() < 70.0

    def test_controller_direction_up(self):
        # dense low-contrast texture, low threshold -> too many corners,
        # controller must raise thresholds
        rs = np.random.RandomState(14)
        img = (128.0 + rs.uniform(-40, 40, (192, 258))).astype(np.float32)
        cfg = grid.GridConfig(cell_capacity=512, set_point=60,
                              init_threshold=6.0)
        t = cfg.init_thresholds()
        f = jax.jit(lambda im, th: grid.detect(im, th, cfg))
        im = jnp.asarray(img)
        for _ in range(20):
            t = f(im, t).thresholds
        assert np.array(t).min() > 6.0

    def test_controller_hysteresis_and_clip(self):
        cfg = grid.GridConfig(set_point=6, cell_capacity=8,
                              init_threshold=4.0, min_threshold=4.0)
        img = jnp.asarray(np.full((64, 96), 100.0, np.float32))  # no corners
        det = grid.detect(img, cfg.init_thresholds(), cfg)
        # count=0 < set-point => thresholds want to fall but clip at min
        np.testing.assert_allclose(np.array(det.thresholds), 4.0)

    def test_row_shares(self):
        cfg = grid.GridConfig(set_point=600, row_shares=(0.5, 2.0))
        sp = np.array(cfg.cell_set_points())
        np.testing.assert_allclose(sp[0], 50.0)   # 600/6 * 0.5
        np.testing.assert_allclose(sp[1], 200.0)  # 600/6 * 2.0


# ---------------------------------------------------------------- subpix
class TestSubpix:
    def test_refines_synthetic_corner(self):
        # blurred step corner whose true vertex sits at (32.0, 32.0)
        yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
        img = np.where((xx < 32.0) & (yy < 32.0), 200.0, 50.0)
        img = np.array(image_ops.gaussian_blur(jnp.asarray(img), 1.0))
        seed = jnp.array([[30.6, 30.6]])
        out = np.array(subpix.corner_subpix(jnp.asarray(img), seed))
        d_seed = np.linalg.norm(np.array([31.5, 31.5]) - seed[0])
        d_ref = np.linalg.norm(np.array([31.5, 31.5]) - out[0])
        assert d_ref < d_seed  # moved toward the saddle of the corner

    def test_invalid_rows_pass_through(self):
        img = jnp.asarray(textured_image(64, 64, seed=6))
        xy = jnp.array([[10.0, 10.0], [20.0, 20.0]])
        out = np.array(subpix.corner_subpix(img, xy,
                                            valid=jnp.array([False, True])))
        np.testing.assert_allclose(out[0], [10.0, 10.0])


# ---------------------------------------------------------------- descriptors
class TestDescriptors:
    def test_pack_unpack_roundtrip(self, rng):
        bits = (rng.uniform(size=(8, 128)) > 0.5).astype(np.float32)
        packed = types.pack_bits(jnp.asarray(bits))
        assert packed.shape == (8, 4)
        back = np.array(types.unpack_bits(packed))
        np.testing.assert_allclose(back, bits)

    def test_brief_lengths(self):
        img = jnp.asarray(textured_image())
        sm = brief.smooth(img)
        xy = jnp.array([[100.0, 100.0], [120.0, 90.0]])
        for nbytes in (16, 32, 64):
            d = brief.describe(sm, xy, nbytes)
            assert d.bits.shape == (2, 8 * nbytes)

    def test_brief_deterministic_and_local(self):
        img = jnp.asarray(textured_image(seed=7))
        sm = brief.smooth(img)
        xy = jnp.array([[100.0, 100.0], [100.0, 100.0], [130.0, 80.0]])
        d = np.array(brief.describe(sm, xy, 32).bits)
        np.testing.assert_allclose(d[0], d[1])      # same point, same bits
        assert np.abs(d[0] - d[2]).sum() > 10       # different point differs

    def test_brief_robust_to_small_noise(self, rng):
        img = textured_image(seed=8)
        noisy = img + rng.normal(0, 2.0, img.shape).astype(np.float32)
        xy = jnp.asarray(rng.uniform(60, 120, (32, 2)).astype(np.float32))
        d0 = np.array(brief.describe(brief.smooth(jnp.asarray(img)), xy, 32).bits)
        d1 = np.array(brief.describe(brief.smooth(jnp.asarray(noisy)), xy, 32).bits)
        ham = np.abs(d0 - d1).sum(1)
        assert np.median(ham) < 32  # < 12.5% of 256 bits flipped

    def test_orb_rotation_steers_descriptor(self):
        img = jnp.asarray(textured_image(seed=9))
        sm = brief.smooth(img)
        xy = jnp.array([[100.0, 100.0]])
        d0 = np.array(orb.describe(sm, xy, jnp.array([0.0]), 32).bits)
        d90 = np.array(orb.describe(sm, xy, jnp.array([np.pi / 2]), 32).bits)
        assert np.abs(d0 - d90).sum() > 10

    def test_orb_orientation_of_gradient_patch(self):
        # bright mass to the right of the keypoint -> angle ~ 0
        img = np.zeros((64, 64), np.float32)
        img[28:37, 32:47] = 200.0
        ang = float(orb.intensity_centroid_angle(
            jnp.asarray(img), jnp.array([[32.0, 32.0]]))[0])
        assert abs(ang) < 0.3

    def test_orb_pyramid_levels_populated(self):
        # sharp blocky texture: FAST needs contrast at 3 px radius, so a
        # smooth blob image fires only on downsampled levels
        r = np.random.RandomState(11)
        img = np.kron(r.uniform(0, 255, (24, 32)),
                      np.ones((8, 8))).astype(np.float32)
        img += r.uniform(0, 2, img.shape).astype(np.float32)
        det, desc = orb.detect_describe_pyramid(
            jnp.asarray(img), n_levels=3, scale_factor=1.3,
            fast_threshold=10.0, max_keypoints=384)
        v = np.asarray(det.keypoints.valid)
        assert v.sum() > 100
        octs = np.bincount(np.asarray(det.octave)[v], minlength=3)
        assert (octs > 0).all()          # every level contributes
        # coords are level-0 pixels, inside the image
        xy = np.asarray(det.keypoints.xy)[v]
        assert (xy[:, 0] < 256).all() and (xy[:, 1] < 192).all()
        # size grows with octave (31 * scale^level)
        sz = np.asarray(det.size)[v]
        o = np.asarray(det.octave)[v]
        assert sz[o == 2].min() > sz[o == 0].max()

    def test_orb_wta_k_one_hot_and_hamming2(self):
        """WTA_K=3/4 descriptors are one-hot per group; the hamming
        matmul over them returns exactly 2x the HAMMING2 distance."""
        img = jnp.asarray(textured_image(seed=12))
        sm = brief.smooth(img)
        xy = jnp.asarray(np.random.RandomState(0)
                         .uniform(60, 120, (16, 2)).astype(np.float32))
        ang = jnp.zeros((16,))
        for k in (3, 4):
            d = orb.describe(sm, xy, ang, 32, wta_k=k)
            groups = 128
            assert d.bits.shape == (16, groups * k)
            g = np.asarray(d.bits).reshape(16, groups, k)
            np.testing.assert_array_equal(g.sum(-1), np.ones((16, groups)))
            # engine distance == 2 * (# groups whose winner differs)
            dist = np.asarray(match.hamming_matrix(d, d))
            win = g.argmax(-1)
            ham2 = (win[:, None, :] != win[None, :, :]).sum(-1)
            np.testing.assert_allclose(dist, 2.0 * ham2, atol=1e-3)

    def test_orb_dense_pyramid_threshold_monotone(self):
        r = np.random.RandomState(13)
        img = np.kron(r.uniform(0, 255, (20, 25)),
                      np.ones((8, 8))).astype(np.float32)
        img += r.uniform(0, 2, img.shape).astype(np.float32)
        lo = np.asarray(orb.detect_dense_pyramid(
            jnp.asarray(img), n_levels=2, fast_threshold=8.0))
        hi = np.asarray(orb.detect_dense_pyramid(
            jnp.asarray(img), n_levels=2, fast_threshold=30.0))
        assert 0 < (hi > 0).sum() <= (lo > 0).sum()
        # margin-score semantics for the sweep service: thresholding the
        # low-threshold map at 30 reproduces the threshold-30 corner set
        # (exact away from the top-k capacity cap, inactive here)
        hi_set = set(zip(*np.nonzero(hi > 0)))
        lo_at_30 = set(zip(*np.nonzero(lo > 30.0)))
        assert hi_set == lo_at_30


# ---------------------------------------------------------------- matching
class TestMatching:
    def _desc(self, rng, n, bits=128):
        return types.Descriptors(
            bits=jnp.asarray((rng.uniform(size=(n, bits)) > 0.5)
                             .astype(np.float32)))

    def test_hamming_matrix_vs_numpy(self, rng):
        da, db = self._desc(rng, 33), self._desc(rng, 47)
        ours = np.array(match.hamming_matrix(da, db))
        a, b = np.array(da.bits), np.array(db.bits)
        ref = (a[:, None, :] != b[None, :, :]).sum(-1)
        np.testing.assert_allclose(ours, ref, atol=1e-3)

    def test_mutual_match_identity(self, rng):
        d = self._desc(rng, 40)
        kp = types.Keypoints(xy=jnp.zeros((40, 2)), score=jnp.ones(40),
                             angle=jnp.zeros(40), valid=jnp.ones(40, bool))
        dist = match.hamming_matrix(d, d) + match.validity_mask(
            kp.valid, kp.valid)
        m = match.mutual_match(dist)
        np.testing.assert_array_equal(np.array(m.train_idx), np.arange(40))
        assert np.array(m.valid).all()

    def test_knn_lowe_rejects_ambiguous(self):
        # two identical train descriptors -> ratio test must reject
        bits = np.zeros((2, 128), np.float32)
        bits[:, :5] = 1.0
        da = types.Descriptors(bits=jnp.asarray(bits[:1]))
        db = types.Descriptors(bits=jnp.asarray(bits))
        dist = match.hamming_matrix(da, db)
        m = match.knn_lowe(dist)
        assert not bool(m.valid[0])

    def test_unique_per_train(self):
        m = types.Matches(train_idx=jnp.array([3, 3, 5], jnp.int32),
                          distance=jnp.array([4.0, 2.0, 1.0]),
                          valid=jnp.ones(3, bool))
        out = match.unique_per_train(m, 8)
        assert np.array(out.valid).tolist() == [False, True, True]

    def test_epipolar_mask(self):
        ka = types.Keypoints(xy=jnp.array([[0.0, 10.0]]), score=jnp.ones(1),
                             angle=jnp.zeros(1), valid=jnp.ones(1, bool))
        kb = types.Keypoints(xy=jnp.array([[0.0, 10.5], [0.0, 20.0]]),
                             score=jnp.ones(2), angle=jnp.zeros(2),
                             valid=jnp.ones(2, bool))
        msk = np.array(match.epipolar_mask(ka, kb, 0.7))
        assert msk[0, 0] == 0.0 and msk[0, 1] >= match.BIG


# ----------------------------------------------------- end-to-end stereo
class TestStereoEndToEnd:
    def test_shifted_image_stereo_matching(self):
        """Right image = left shifted by a known disparity; the full
        detect→describe→match path must recover that disparity."""
        left = textured_image(192, 256, seed=11, n_blobs=80)
        # sensor-style texture so corner scores don't tie (cv2-exact NMS
        # annihilates equal-score neighbours on noise-free blocks)
        left = np.clip(np.round(
            left + np.random.RandomState(1).normal(0, 2.0, left.shape)),
            0, 255).astype(np.float32)
        disp = 7
        right = np.roll(left, -disp, axis=1)

        cfg = grid.GridConfig(cell_capacity=128, set_point=500,
                              init_threshold=20.0)
        detl = grid.detect(jnp.asarray(left), cfg.init_thresholds(), cfg)
        detr = grid.detect(jnp.asarray(right), cfg.init_thresholds(), cfg)
        kl, kr = detl.keypoints, detr.keypoints

        sml, smr = brief.smooth(jnp.asarray(left)), brief.smooth(jnp.asarray(right))
        bl = brief.valid_mask(kl.xy, 256, 192)
        br = brief.valid_mask(kr.xy, 256, 192)
        kl = kl.replace(valid=kl.valid & bl)
        kr = kr.replace(valid=kr.valid & br)
        dl = brief.describe(sml, kl.xy, 16)
        dr = brief.describe(smr, kr.xy, 16)

        m = match.stereo_match_live(kl, dl, kr, dr, epi_threshold=0.7,
                                    max_disparity=30.0)
        v = np.array(m.valid)
        assert v.sum() >= 20
        dx = (np.array(kl.xy)[v, 0]
              - np.array(kr.xy)[np.array(m.train_idx)[v], 0])
        # most recovered disparities equal the true shift
        frac = np.mean(np.abs(dx - disp) <= 1.0)
        assert frac > 0.8
