"""Stereo rectification tests (io/rectify.py + EuRoC wiring).

The oracle is geometry: after rectification a 3D point must project to
the SAME row in both cameras with disparity fx*B/Z — the property the
pipeline's epipolar gates (|dy| <= 0.7 px, `live_stereo.cpp:372`) and
Q-triangulation assume.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from front_end_tpu.io import rectify


def euroc_like_calib():
    """cam0/cam1 in the EuRoC ballpark: radtan distortion, ~11 cm
    baseline, a small relative rotation, slight vertical offset."""
    K0 = np.array([[458.654, 0, 367.215], [0, 457.296, 248.375],
                   [0, 0, 1.0]])
    K1 = np.array([[457.587, 0, 379.999], [0, 456.134, 255.238],
                   [0, 0, 1.0]])
    D0 = np.array([-0.2834, 0.0739, 0.0002, 1.76e-05])
    D1 = np.array([-0.2837, 0.0745, -0.0001, -5.7e-05])
    R = rectify.rodrigues(np.array([0.003, -0.002, 0.001]))
    t = np.array([-0.1100, 0.0004, -0.0007])       # x1 = R x0 + t
    return K0, D0, K1, D1, R, t, (752, 480)


class TestRotations:
    def test_rodrigues_round_trip(self):
        for v in ([0.1, -0.2, 0.3], [0, 0, 0], [1.2, 0.0, 0.0]):
            v = np.asarray(v, float)
            R = rectify.rodrigues(v)
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
            np.testing.assert_allclose(rectify.rotation_vector(R), v,
                                       atol=1e-9)


class TestStereoRectify:
    def test_epipolar_alignment_and_disparity(self):
        K0, D0, K1, D1, R, t, size = euroc_like_calib()
        R0, R1, Kn, B = rectify.stereo_rectify(K0, D0, K1, D1, R, t, size)
        # rotations orthonormal
        for M in (R0, R1):
            np.testing.assert_allclose(M @ M.T, np.eye(3), atol=1e-10)
        assert abs(B - np.linalg.norm(t)) < 1e-12

        rng = np.random.RandomState(0)
        X0 = np.stack([rng.uniform(-2, 2, 64), rng.uniform(-1.5, 1.5, 64),
                       rng.uniform(2.0, 12.0, 64)], -1)   # cam0 frame
        X1 = X0 @ R.T + t
        xr0 = X0 @ R0.T                                   # rectified frames
        xr1 = X1 @ R1.T
        p0 = (xr0 / xr0[:, 2:]) @ Kn.T
        p1 = (xr1 / xr1[:, 2:]) @ Kn.T
        # rows aligned
        np.testing.assert_allclose(p0[:, 1], p1[:, 1], atol=1e-8)
        # positive disparity = fx * B / Z
        disp = p0[:, 0] - p1[:, 0]
        np.testing.assert_allclose(disp, Kn[0, 0] * B / xr0[:, 2],
                                   rtol=1e-9)

    def test_identity_calib_gives_identity_maps(self):
        K = np.array([[400.0, 0, 160], [0, 400, 120], [0, 0, 1]])
        D = np.zeros(4)
        R0, R1, Kn, B = rectify.stereo_rectify(
            K, D, K, D, np.eye(3), np.array([-0.2, 0, 0]), (320, 240))
        mx, my = rectify.rectify_map(K, D, R0, Kn, (320, 240))
        u, v = np.meshgrid(np.arange(320, dtype=np.float32),
                           np.arange(240, dtype=np.float32))
        np.testing.assert_allclose(mx, u, atol=1e-4)
        np.testing.assert_allclose(my, v, atol=1e-4)


class TestRemap:
    def test_identity_remap(self, rng):
        img = rng.uniform(0, 255, (24, 32)).astype(np.float32)
        u, v = np.meshgrid(np.arange(32, dtype=np.float32),
                           np.arange(24, dtype=np.float32))
        out = np.asarray(rectify.remap_bilinear(
            jnp.asarray(img), jnp.asarray(u), jnp.asarray(v)))
        np.testing.assert_allclose(out, img, atol=1e-4)

    def test_half_pixel_shift_interpolates(self, rng):
        img = rng.uniform(0, 255, (16, 20)).astype(np.float32)
        u, v = np.meshgrid(np.arange(20, dtype=np.float32),
                           np.arange(16, dtype=np.float32))
        out = np.asarray(rectify.remap_bilinear(
            jnp.asarray(img), jnp.asarray(u + 0.5), jnp.asarray(v)))
        ref = 0.5 * (img[:, :-1] + img[:, 1:])
        np.testing.assert_allclose(out[:, :19], ref, atol=1e-3)

    def test_out_of_bounds_zero(self, rng):
        img = rng.uniform(1, 255, (16, 20)).astype(np.float32)
        u = np.full((4, 4), -3.0, np.float32)
        v = np.full((4, 4), 2.0, np.float32)
        out = np.asarray(rectify.remap_bilinear(
            jnp.asarray(img), jnp.asarray(u), jnp.asarray(v)))
        assert (out == 0).all()


class TestEurocWiring:
    def _write_seq(self, root):
        """Minimal EuRoC-layout sequence with real-format sensor.yaml and
        PGM frames."""
        K0, D0, K1, D1, R, t, size = euroc_like_calib()
        seq = os.path.join(root, "T_01")
        T0 = np.eye(4)
        T1 = np.eye(4)
        T1[:3, :3] = np.linalg.inv(R)      # T_BS: body<-cam
        T1[:3, 3] = -np.linalg.inv(R) @ t
        for cam, K, D, T in (("cam0", K0, D0, T0), ("cam1", K1, D1, T1)):
            d = os.path.join(seq, "mav0", cam)
            os.makedirs(os.path.join(d, "data"), exist_ok=True)
            fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
            with open(os.path.join(d, "sensor.yaml"), "w") as f:
                f.write(
                    "sensor_type: camera\n"
                    "T_BS:\n  cols: 4\n  rows: 4\n"
                    f"  data: {np.round(T.reshape(-1), 9).tolist()}\n"
                    f"rate_hz: 20\nresolution: [{size[0]}, {size[1]}]\n"
                    "camera_model: pinhole\n"
                    f"intrinsics: [{fx}, {fy}, {cx}, {cy}]\n"
                    "distortion_model: radial-tangential\n"
                    f"distortion_coefficients: {D.tolist()}\n")
            img = (np.arange(size[0] * size[1]) % 251).astype(np.uint8)
            img = img.reshape(size[1], size[0])
            with open(os.path.join(d, "data", "0001.png"), "wb") as f:
                # PGM payload with .png name (PIL sniffs content)
                f.write(b"P5\n%d %d\n255\n" % size + img.tobytes())
        return root

    def test_sequence_rectifies(self, tmp_path):
        from front_end_tpu.io.euroc import EurocSequence
        root = self._write_seq(str(tmp_path))
        seq = EurocSequence(root, "T_01", rectify=True)
        assert len(seq) == 1
        l, r = seq[0]
        assert np.asarray(l).shape == (480, 752)
        rig = seq.rig
        # rectified rig carries the calib baseline and mean focal
        assert abs(rig.baseline - 0.11) < 0.001
        assert 450 < float(rig.fx) < 465

    def test_rectifier_row_alignment_from_yaml(self, tmp_path):
        from front_end_tpu.io import euroc
        root = self._write_seq(str(tmp_path))
        rect = euroc.build_rectifier(os.path.join(root, "T_01"))
        K0, D0, K1, D1, R, t, size = euroc_like_calib()
        rng = np.random.RandomState(1)
        X0 = np.stack([rng.uniform(-1, 1, 32), rng.uniform(-1, 1, 32),
                       rng.uniform(3, 10, 32)], -1)
        X1 = X0 @ R.T + t
        p0 = (X0 @ rect.R0.T)
        p1 = (X1 @ rect.R1.T)
        p0 = (p0 / p0[:, 2:]) @ rect.K_new.T
        p1 = (p1 / p1[:, 2:]) @ rect.K_new.T
        np.testing.assert_allclose(p0[:, 1], p1[:, 1], atol=1e-6)
        assert (p0[:, 0] - p1[:, 0] > 0).all()
