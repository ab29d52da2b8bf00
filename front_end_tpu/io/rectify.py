"""Stereo rectification — one-time map precompute + on-device remap.

The reference never rectifies (its Bumblebee pairs arrive rectified from
the `bumblebee` calibration server, `src/StereoCamera.cpp:10-21`); EuRoC
(BASELINE config 3) ships raw radial-tangential-distorted, non-coplanar
cameras, so the framework needs the step the reference outsourced.

Design: all calibration math (Bouguet-style rectifying rotations, new
common intrinsics, inverse-map construction with radtan distortion) runs
ONCE in numpy at sequence-open time; per-frame work is a single jitted
bilinear gather on device.  The rectified pair feeds the standard
`StereoRig` pipeline unchanged (epipolar rows aligned, positive
disparity).
"""
from __future__ import annotations

import functools

import numpy as np


def rodrigues(r: np.ndarray) -> np.ndarray:
    """Axis-angle vector -> rotation matrix."""
    th = float(np.linalg.norm(r))
    if th < 1e-12:
        return np.eye(3)
    k = r / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def rotation_vector(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> axis-angle vector (inverse Rodrigues)."""
    ct = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    th = float(np.arccos(ct))
    if th < 1e-12:
        return np.zeros(3)
    v = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return v / (2.0 * np.sin(th)) * th


def radtan_distort(x, y, D):
    """Apply radial-tangential distortion to normalized coords."""
    k1, k2, p1, p2 = D
    r2 = x * x + y * y
    rad = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * rad + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * rad + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return xd, yd


def stereo_rectify(K0, D0, K1, D1, R, t, size):
    """Rectifying rotations + common intrinsics for a stereo pair.

    R, t: cam0 -> cam1 (x1 = R @ x0 + t).  Returns (R_rect0, R_rect1,
    K_new, baseline) with the LEFT camera as the rectified reference:
    R_recti rotate camera-i coords into the rectified frame whose x axis
    runs left->right along the baseline, so disparity is positive.
    """
    K0, K1, R, t = map(np.asarray, (K0, K1, R, t))
    om = rotation_vector(R)
    r_half = rodrigues(-om / 2.0)         # split the rotation equally
    t_new = r_half @ t
    B = float(np.linalg.norm(t_new))

    # direct alignment: rectified x axis = -t (so cam1 sits at +B x)
    e1 = -t_new / B
    e2 = np.cross([0.0, 0.0, 1.0], e1)
    e2 /= np.linalg.norm(e2)
    e3 = np.cross(e1, e2)
    Rw = np.stack([e1, e2, e3])           # rows

    R_rect1 = Rw @ r_half
    R_rect0 = Rw @ r_half @ R             # R_rect0 @ x0 aligns with cam1
    # NB: with x1 = R x0 + t, rotating cam0 by (r_half @ R) and cam1 by
    # r_half gives both the same orientation; Rw then levels the baseline.

    f = (K0[0, 0] + K0[1, 1] + K1[0, 0] + K1[1, 1]) / 4.0
    cx = (K0[0, 2] + K1[0, 2]) / 2.0
    cy = (K0[1, 2] + K1[1, 2]) / 2.0
    K_new = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1.0]])
    return R_rect0, R_rect1, K_new, B


def rectify_map(K_src, D_src, R_rect, K_new, size):
    """Inverse map for one camera: for every rectified output pixel, the
    source-image pixel to sample.  Returns (map_x, map_y) each (H, W)."""
    W, H = size
    u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(H, dtype=np.float64))
    Kinv = np.linalg.inv(K_new)
    rays = np.stack([u, v, np.ones_like(u)], 0).reshape(3, -1)
    rays = np.linalg.inv(R_rect) @ (Kinv @ rays)     # back to source cam
    x = rays[0] / rays[2]
    y = rays[1] / rays[2]
    xd, yd = radtan_distort(x, y, D_src)
    mx = K_src[0, 0] * xd + K_src[0, 2]
    my = K_src[1, 1] * yd + K_src[1, 2]
    return (mx.reshape(H, W).astype(np.float32),
            my.reshape(H, W).astype(np.float32))


@functools.partial(__import__("jax").jit, static_argnames=())
def remap_bilinear(img, map_x, map_y):
    """Sample `img` at fractional (map_x, map_y) — the cv2.remap step,
    jitted so per-frame rectification is one fused device gather."""
    import jax.numpy as jnp

    img = jnp.asarray(img, jnp.float32)
    H, W = img.shape
    x0 = jnp.floor(map_x)
    y0 = jnp.floor(map_y)
    fx = map_x - x0
    fy = map_y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    flat = img.reshape(-1)

    def at(yy, xx):
        return flat[yy * W + xx]

    out = ((1 - fx) * (1 - fy) * at(y0i, x0i)
           + fx * (1 - fy) * at(y0i, x1i)
           + (1 - fx) * fy * at(y1i, x0i)
           + fx * fy * at(y1i, x1i))
    inb = ((map_x >= 0) & (map_x <= W - 1) & (map_y >= 0)
           & (map_y <= H - 1))
    return jnp.where(inb, out, 0.0)


class StereoRectifier:
    """Precomputed rectifier for a calibrated stereo pair."""

    def __init__(self, K0, D0, K1, D1, R, t, size):
        self.R0, self.R1, self.K_new, self.baseline = stereo_rectify(
            K0, D0, K1, D1, R, t, size)
        self.size = size
        self.map0 = rectify_map(np.asarray(K0), D0, self.R0, self.K_new,
                                size)
        self.map1 = rectify_map(np.asarray(K1), D1, self.R1, self.K_new,
                                size)

    def rig(self):
        from front_end_tpu.geometry.camera import StereoRig
        W, H = self.size
        return StereoRig.create(
            fx=float(self.K_new[0, 0]), cx=float(self.K_new[0, 2]),
            cy=float(self.K_new[1, 2]), baseline=float(self.baseline),
            width=W, height=H)

    def __call__(self, left, right):
        import jax.numpy as jnp
        l = remap_bilinear(left, jnp.asarray(self.map0[0]),
                           jnp.asarray(self.map0[1]))
        r = remap_bilinear(right, jnp.asarray(self.map1[0]),
                           jnp.asarray(self.map1[1]))
        return l, r
