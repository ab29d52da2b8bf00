import jax
import jax.numpy as jnp
import numpy as np
import pytest

from front_end_tpu.geometry import se3


def Rx(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def Ry(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def Rz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def test_euler_matrix_szxy_convention():
    # tf 'szxy' static frame == Ry(yaw) @ Rx(pitch) @ Rz(roll)
    ai, aj, ak = 0.3, -0.4, 0.7
    M = np.array(se3.euler_matrix(ai, aj, ak, "szxy"))
    np.testing.assert_allclose(M, Ry(ak) @ Rx(aj) @ Rz(ai), atol=1e-6)


def test_euler_roundtrip_batched(rng):
    ang = rng.uniform(-1.2, 1.2, size=(64, 3)).astype(np.float32)
    M = se3.euler_matrix(ang[:, 0], ang[:, 1], ang[:, 2], "szxy")
    a0, a1, a2 = se3.euler_from_matrix(M, "szxy")
    back = np.stack([a0, a1, a2], -1)
    np.testing.assert_allclose(back, ang, atol=1e-5)


def test_compose_R_degrees():
    R = np.array(se3.compose_R(10.0, 20.0, 30.0))
    exp = Ry(np.radians(30)) @ Rx(np.radians(20)) @ Rz(np.radians(10))
    np.testing.assert_allclose(R, exp, atol=1e-6)


def test_create_and_invert_homog(rng):
    R = np.array(se3.compose_R(5.0, -3.0, 8.0))
    T = np.array([0.1, -0.2, 0.5])
    H = np.array(se3.create_homog(R, T))
    assert H.shape == (4, 4)
    np.testing.assert_allclose(H[:3, :3], R, atol=1e-6)
    Hinv = np.array(se3.invert_homog(H))
    np.testing.assert_allclose(Hinv @ H, np.eye(4), atol=1e-5)


def test_compose_decompose_transform():
    R = np.array(se3.compose_R(5.0, -3.0, 8.0))
    T = np.array([0.1, -0.2, 0.5])
    H = se3.compose_transform(R, T)          # extrinsic [R | -R T]
    back = np.array(se3.decompose_transform(H))
    np.testing.assert_allclose(back[:3, 3], T, atol=1e-5)
    np.testing.assert_allclose(back[:3, :3], R, atol=1e-6)


def test_get_motion():
    H = se3.create_homog(se3.compose_R(4.0, -2.0, 9.0), jnp.array([1., 2., 3.]))
    ang, t = se3.get_motion(H)
    np.testing.assert_allclose(np.array(ang), [4.0, -2.0, 9.0], atol=1e-3)
    np.testing.assert_allclose(np.array(t), [1.0, 2.0, 3.0], atol=1e-6)


@pytest.mark.parametrize("scale", [1e-8, 1e-4, 0.1, 1.0, 3.0])
def test_so3_exp_log_roundtrip(rng, scale):
    w = rng.normal(size=(32, 3)).astype(np.float32)
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * scale
    R = se3.so3_exp(jnp.asarray(w))
    # orthonormality
    RtR = np.einsum("nij,nik->njk", np.array(R), np.array(R))
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape),
                               atol=1e-5)
    back = np.array(se3.so3_log(R))
    np.testing.assert_allclose(back, w, atol=2e-4)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(16, 6)).astype(np.float32) * 0.5
    H = se3.se3_exp(jnp.asarray(xi))
    back = np.array(se3.se3_log(H))
    np.testing.assert_allclose(back, xi, atol=2e-4)


def test_se3_exp_jit_grad():
    f = jax.jit(lambda x: jnp.sum(se3.se3_exp(x)[..., :3, 3] ** 2))
    g = jax.grad(f)(jnp.array([0.1, 0.2, 0.3, 0.01, 0.02, 0.03]))
    assert np.all(np.isfinite(np.array(g)))


def test_transform_points(rng):
    X = rng.normal(size=(100, 3)).astype(np.float32)
    H = se3.se3_exp(jnp.array([0.2, -0.1, 0.4, 0.1, -0.2, 0.05]))
    Y = np.array(se3.transform_points(H, jnp.asarray(X)))
    exp = X @ np.array(H)[:3, :3].T + np.array(H)[:3, 3]
    np.testing.assert_allclose(Y, exp, atol=1e-5)


def test_rotation_geodesic_error():
    R1 = se3.compose_R(0.0, 0.0, 0.0)
    R2 = se3.compose_R(0.0, 0.0, 10.0)   # 10 degrees yaw
    err = float(se3.rotation_geodesic_error(R1, R2))
    np.testing.assert_allclose(np.degrees(err), 10.0, atol=1e-3)
