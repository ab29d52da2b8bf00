"""SE(3) / SO(3) utilities — jittable, batched, float64-friendly.

Capability parity with the reference's motion helpers
(`/root/reference/src/front_end/~motion.py:11-186`,
`src/nodeTypes.cpp:4-86`): Euler composition in the tf 'szxy' convention,
homogeneous transform packing (`createHomog`), the pose/extrinsic flip
(`composeTransform` / `decomposeTransform`), motion extraction and motion
comparison metrics.  The reference's `nodeTypes.cpp:28-57` swaps Rx/Rz —
a latent bug we deliberately do NOT replicate; this module follows the tf
`transformations.py` axis-sequence algorithm exactly.

Additionally provides the SO(3)/SE(3) exp/log maps the reference never
needed (scipy/g2o supplied them) — they are the manifold backbone for the
TPU-native Gauss-Newton / Levenberg-Marquardt solvers in
`front_end_tpu.motion.lm` and `front_end_tpu.ba`.

All functions are pure jnp, shape-polymorphic over leading batch dims where
noted, and safe under `jax.jit` / `vmap` / `grad`.
"""
from __future__ import annotations

import jax.numpy as jnp

_NEXT_AXIS = (1, 2, 0, 1)

# axes string -> (firstaxis, parity, repetition, frame); static-frame subset
_AXES2TUPLE = {
    "sxyz": (0, 0, 0, 0), "sxzy": (0, 1, 0, 0),
    "syzx": (1, 0, 0, 0), "syxz": (1, 1, 0, 0),
    "szxy": (2, 0, 0, 0), "szyx": (2, 1, 0, 0),
}

DEG2RAD = jnp.pi / 180.0
RAD2DEG = 180.0 / jnp.pi


def euler_matrix(ai, aj, ak, axes: str = "szxy"):
    """Rotation matrix (3,3) from Euler angles (radians), tf-compatible.

    Matches `tf.transformations.euler_matrix` for static-frame,
    non-repeating axis sequences.  The reference composes all its motions
    with 'szxy' (roll, pitch, yaw) — `~motion.py:11-20`.
    Supports batched angle inputs (broadcast together).
    """
    firstaxis, parity, _rep, _frame = _AXES2TUPLE[axes]
    i = firstaxis
    j = _NEXT_AXIS[i + parity]
    k = _NEXT_AXIS[i - parity + 1]
    ai, aj, ak = jnp.asarray(ai), jnp.asarray(aj), jnp.asarray(ak)
    if parity:
        ai, aj, ak = -ai, -aj, -ak
    si, sj, sk = jnp.sin(ai), jnp.sin(aj), jnp.sin(ak)
    ci, cj, ck = jnp.cos(ai), jnp.cos(aj), jnp.cos(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk

    batch = jnp.broadcast_shapes(ai.shape, aj.shape, ak.shape)
    M = jnp.zeros(batch + (3, 3), dtype=jnp.result_type(ai, aj, ak, jnp.float32))
    M = M.at[..., i, i].set(cj * ck)
    M = M.at[..., i, j].set(sj * sc - cs)
    M = M.at[..., i, k].set(sj * cc + ss)
    M = M.at[..., j, i].set(cj * sk)
    M = M.at[..., j, j].set(sj * ss + cc)
    M = M.at[..., j, k].set(sj * cs - sc)
    M = M.at[..., k, i].set(-sj)
    M = M.at[..., k, j].set(cj * si)
    M = M.at[..., k, k].set(cj * ci)
    return M


def euler_from_matrix(R, axes: str = "szxy"):
    """Inverse of :func:`euler_matrix`; returns (ai, aj, ak) radians.

    Branchless (jnp.where) version of the tf algorithm so it stays
    jittable; gimbal-lock branch selected at |cos(aj)| < 1e-8.
    """
    firstaxis, parity, _rep, _frame = _AXES2TUPLE[axes]
    i = firstaxis
    j = _NEXT_AXIS[i + parity]
    k = _NEXT_AXIS[i - parity + 1]
    R = jnp.asarray(R)
    sy = jnp.sqrt(R[..., i, i] ** 2 + R[..., j, i] ** 2)
    singular = sy < 1e-8
    ax = jnp.where(singular,
                   jnp.arctan2(-R[..., j, k], R[..., j, j]),
                   jnp.arctan2(R[..., k, j], R[..., k, k]))
    ay = jnp.arctan2(-R[..., k, i], sy)
    az = jnp.where(singular, 0.0, jnp.arctan2(R[..., j, i], R[..., i, i]))
    if parity:
        ax, ay, az = -ax, -ay, -az
    return ax, ay, az


def compose_R(roll, pitch, yaw, degrees: bool = True):
    """Reference `composeR` (`~motion.py:11-20`): szxy Euler -> R (3,3)."""
    s = DEG2RAD if degrees else 1.0
    return euler_matrix(roll * s, pitch * s, yaw * s, "szxy")


def create_homog(R=None, T=None):
    """Reference `createHomog` (`~motion.py:45-51`): pack [R|T; 0 1]."""
    if R is None:
        R = jnp.eye(3)
    if T is None:
        T = jnp.zeros((3,))
    R = jnp.asarray(R)
    T = jnp.asarray(T).reshape(R.shape[:-2] + (3,))
    batch = R.shape[:-2]
    H = jnp.zeros(batch + (4, 4), dtype=jnp.result_type(R, T))
    H = H.at[..., :3, :3].set(R)
    H = H.at[..., :3, 3].set(T)
    H = H.at[..., 3, 3].set(1.0)
    return H


def compose_transform(R, T):
    """Reference `composeTransform` (`~motion.py:53-56`): H = [R | -R·T]."""
    T = jnp.asarray(T).reshape(jnp.asarray(R).shape[:-2] + (3, 1))
    return create_homog(R, (-jnp.asarray(R) @ T)[..., 0])


def decompose_transform(H):
    """Reference `decomposeTransform` (`~motion.py:59-62`).

    Given an extrinsic H=[R|t], recover the pose form [R | -R⁻¹·t]
    (camera centre), returned re-packed as a homogeneous matrix.
    """
    H = jnp.asarray(H)
    R = H[..., :3, :3]
    t = H[..., :3, 3:4]
    T = -jnp.swapaxes(R, -1, -2) @ t  # R orthonormal: inv = transpose
    return create_homog(R, T[..., 0])


def invert_homog(H):
    """Rigid inverse: [R|t]⁻¹ = [Rᵀ | -Rᵀ t]."""
    H = jnp.asarray(H)
    R = H[..., :3, :3]
    t = H[..., :3, 3:4]
    Rt = jnp.swapaxes(R, -1, -2)
    return create_homog(Rt, (-Rt @ t)[..., 0])


def get_motion(H, degrees: bool = True):
    """Reference `getMotion` (`~motion.py:88-97`): H -> (rpy, xyz).

    Returns (angles (...,3) [roll,pitch,yaw], translation (...,3)).
    """
    ax, ay, az = euler_from_matrix(jnp.asarray(H)[..., :3, :3], "szxy")
    ang = jnp.stack([ax, ay, az], axis=-1)
    if degrees:
        ang = ang * RAD2DEG
    return ang, jnp.asarray(H)[..., :3, 3]


def motion_absolute_error(H, H_est):
    """Reference `compareAbsoluteMotion` (`~motion.py:120-131`).

    Returns (|Δrpy| degrees (...,3), |Δxyz| in the translation unit (...,3)).
    (The reference reports translation in mm; we keep native units.)
    """
    a1, t1 = get_motion(H)
    a2, t2 = get_motion(H_est)
    return jnp.abs(a1 - a2), jnp.abs(t1 - t2)


def rotation_geodesic_error(R1, R2):
    """Geodesic angle (radians) between two rotations — a sounder metric
    than per-Euler-angle errors; used by the test suite alongside the
    reference-style comparisons."""
    R = jnp.swapaxes(jnp.asarray(R1), -1, -2) @ jnp.asarray(R2)
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    c = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return jnp.arccos(c)


# ---------------------------------------------------------------------------
# Manifold ops (exp/log) for the GN/LM solvers.
# ---------------------------------------------------------------------------

def hat(w):
    """so(3) hat: (...,3) -> (...,3,3) skew-symmetric."""
    w = jnp.asarray(w)
    z = jnp.zeros_like(w[..., 0])
    return jnp.stack([
        jnp.stack([z, -w[..., 2], w[..., 1]], axis=-1),
        jnp.stack([w[..., 2], z, -w[..., 0]], axis=-1),
        jnp.stack([-w[..., 1], w[..., 0], z], axis=-1),
    ], axis=-2)


def so3_exp(w):
    """Rodrigues: (...,3) -> (...,3,3).  Taylor-safe near ||w||=0."""
    w = jnp.asarray(w)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-32)
    small = theta < 1e-6
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * (W @ W)


def so3_log(R):
    """Inverse Rodrigues: (...,3,3) -> (...,3)."""
    R = jnp.asarray(R)
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    c = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(c)
    small = theta < 1e-6
    scale = jnp.where(small, 0.5 + theta**2 / 12.0,
                      theta / (2.0 * jnp.sin(jnp.where(small, 1.0, theta))))
    w = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], axis=-1)
    return scale[..., None] * w


def se3_exp(xi):
    """se(3) exp: (...,6) [v, w] -> (...,4,4) homogeneous transform."""
    xi = jnp.asarray(xi)
    v, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-32)
    small = theta < 1e-6
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / theta2)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + A[..., None, None] * W + B[..., None, None] * (W @ W)
    V = eye + B[..., None, None] * W + C[..., None, None] * (W @ W)
    t = (V @ v[..., None])[..., 0]
    return create_homog(R, t)


def se3_log(H):
    """se(3) log: (...,4,4) -> (...,6) [v, w]."""
    H = jnp.asarray(H)
    R = H[..., :3, :3]
    t = H[..., :3, 3]
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-32)
    small = theta < 1e-6
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    # V^{-1} = I - W/2 + (1/theta^2)(1 - A/(2B)) W^2
    coef = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                     (1.0 - A / (2.0 * B)) / theta2)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=H.dtype), W.shape)
    Vinv = eye - 0.5 * W + coef[..., None, None] * (W @ W)
    v = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([v, w], axis=-1)


def transform_points(H, X):
    """Apply (...,4,4) to points (...,N,3) -> (...,N,3)."""
    H = jnp.asarray(H)
    X = jnp.asarray(X)
    return X @ jnp.swapaxes(H[..., :3, :3], -1, -2) + H[..., None, :3, 3]
