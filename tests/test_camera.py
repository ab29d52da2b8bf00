import jax.numpy as jnp
import numpy as np

from front_end_tpu.geometry.camera import StereoRig, kitti_rig


def test_projection_matrices():
    rig = StereoRig.create(fx=700.0, baseline=0.5, width=1241, height=376)
    Pl, Pr = np.array(rig.Pl), np.array(rig.Pr)
    assert Pl.shape == (3, 4) and Pr.shape == (3, 4)
    np.testing.assert_allclose(Pl[:, :3], Pr[:, :3])
    np.testing.assert_allclose(Pr[0, 3], -700.0 * 0.5)


def test_project_triangulate_roundtrip(rng):
    rig = kitti_rig()
    X = np.stack([rng.uniform(-5, 5, 200), rng.uniform(-2, 2, 200),
                  rng.uniform(2, 40, 200)], -1).astype(np.float32)
    l, r = rig.project(jnp.asarray(X))
    Xb = np.array(rig.triangulate(l, r))
    np.testing.assert_allclose(Xb, X, rtol=2e-3, atol=2e-3)


def test_triangulate_matches_q_matrix(rng):
    """Q-matrix reprojection (WindowMatcher.cpp:36-51 semantics) agrees with
    the closed-form triangulation."""
    rig = kitti_rig()
    X = np.array([[1.0, -0.5, 10.0]])
    l, r = rig.project(jnp.asarray(X))
    d = float(l[0, 0] - r[0, 0])
    v = np.array([float(l[0, 0]), float(l[0, 1]), d, 1.0])
    p = np.array(rig.Q) @ v
    p = p / p[3]
    np.testing.assert_allclose(p[:3], X[0], rtol=1e-4, atol=1e-4)


def test_epipolar_rectified(rng):
    """Rectified pair: vl == vr exactly."""
    rig = kitti_rig()
    X = np.stack([rng.uniform(-5, 5, 50), rng.uniform(-2, 2, 50),
                  rng.uniform(2, 40, 50)], -1)
    l, r = rig.project(jnp.asarray(X))
    np.testing.assert_allclose(np.array(l)[:, 1], np.array(r)[:, 1], atol=1e-6)


def test_in_view():
    rig = kitti_rig()
    X = jnp.array([[0.0, 0.0, 10.0],      # centre, visible
                   [0.0, 0.0, -5.0],      # behind camera
                   [1000.0, 0.0, 10.0]])  # far off-image
    m = np.array(rig.in_view(X))
    assert m.tolist() == [True, False, False]


def test_project4_layout():
    rig = kitti_rig()
    X = jnp.array([[1.0, 2.0, 15.0]])
    m = np.array(rig.project4(X))
    l, r = rig.project(X)
    np.testing.assert_allclose(m[0], np.concatenate([np.array(l)[0],
                                                     np.array(r)[0]]))


def test_rig_is_jit_transparent():
    import jax

    rig = kitti_rig()

    @jax.jit
    def f(rig, X):
        return rig.project4(X)

    out = f(rig, jnp.ones((4, 3)))
    assert out.shape == (4, 4)
