import jax
import jax.numpy as jnp
import numpy as np

from front_end_tpu.ba import distributed, schur
from front_end_tpu.geometry import se3
from front_end_tpu.geometry.camera import bumblebee_rig
from front_end_tpu.sim import synthetic as sim


def make_window(W=4, L=256, seed=0, noise_px=0.0, perturb=0.02):
    """Synthetic BA window: W-pose chain, L landmarks, (L, W, 4) stereo
    measurements with visibility, plus perturbed initial values."""
    rig = bumblebee_rig()
    key = jax.random.PRNGKey(seed)
    cat = sim.motion_category("medium")

    # ground-truth extrinsic chain T_w (camera_from_world), world = cam 0
    Ts = [jnp.eye(4)]
    for i in range(W - 1):
        key, k = jax.random.split(key)
        _, Ht = sim.sample_motion(k, cat)
        Ts.append(Ht @ Ts[-1])
    T = jnp.stack(Ts)                                     # (W,4,4)

    # landmarks in the world (= camera-0) frame, sampled in frustum
    key, k = jax.random.split(key)
    w0 = sim.sample_world(k, rig, cat, L)
    X = w0.Xa                                             # (L,3)

    # project into every frame
    Xc = jax.vmap(lambda Tw: se3.transform_points(Tw, X))(T)      # (W,L,3)
    meas = jax.vmap(rig.project4)(Xc)                     # (W,L,4)
    vis = jax.vmap(lambda Xw: rig.in_view(Xw))(Xc)        # (W,L)
    meas = jnp.swapaxes(meas, 0, 1)                       # (L,W,4)
    vis = jnp.swapaxes(vis, 0, 1) & w0.valid[:, None]

    if noise_px > 0:
        key, k = jax.random.split(key)
        meas = meas + noise_px * jax.random.normal(k, meas.shape)

    # perturbed initialization (pose 0 is the gauge, stays exact)
    key, kp, kl = jax.random.split(key, 3)
    dxi = perturb * jax.random.normal(kp, (W, 6))
    dxi = dxi.at[0].set(0.0)
    T0 = jax.vmap(lambda d, t: se3.se3_exp(d) @ t)(dxi, T)
    X0 = X + 0.05 * jax.random.normal(kl, X.shape)
    return rig, T, X, T0, X0, meas, vis


def pose_errors(T_est, T_true):
    ang = np.array(jax.vmap(se3.rotation_geodesic_error)(
        T_est[:, :3, :3], T_true[:, :3, :3]))
    t = np.array(jnp.linalg.norm(T_est[:, :3, 3] - T_true[:, :3, 3], axis=-1))
    return np.degrees(ang), t


class TestFactors:
    def test_analytic_jacobians_match_ad(self):
        from front_end_tpu.ba import factors
        rig = bumblebee_rig()
        T = se3.se3_exp(jnp.array([0.1, -0.2, 0.05, 0.02, 0.01, -0.03]))
        Xw = jnp.array([1.0, -0.5, 6.0])
        z = jnp.zeros(4)
        r, Jp, Jl = factors.residual_and_jacobians(T, Xw, z, rig)

        def f_pose(d):
            return factors.residual(se3.se3_exp(d) @ T, Xw, z, rig)

        def f_lm(dx):
            return factors.residual(T, Xw + dx, z, rig)

        Jp_ad = jax.jacfwd(f_pose)(jnp.zeros(6))
        Jl_ad = jax.jacfwd(f_lm)(jnp.zeros(3))
        np.testing.assert_allclose(np.array(Jp), np.array(Jp_ad),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.array(Jl), np.array(Jl_ad),
                                   rtol=1e-3, atol=1e-3)


class TestBASolve:
    def test_recovers_window_ideal(self):
        rig, T, X, T0, X0, meas, vis = make_window(noise_px=0.0)
        a0, t0 = pose_errors(np.array(T0), np.array(T))
        res = schur.ba_solve(T0, X0, meas, vis, rig, iters=15)
        a1, t1 = pose_errors(np.array(res.poses), np.array(T))
        assert float(res.cost) < 1e-2 * float(res.cost0)
        assert a1.max() < 0.05 and t1.max() < 2e-3
        assert a1.max() < a0.max()
        assert float(res.rms_px) < 0.1

    def test_noise_floor(self):
        rig, T, X, T0, X0, meas, vis = make_window(noise_px=0.5, seed=1)
        res = schur.ba_solve(T0, X0, meas, vis, rig, iters=15)
        # RMS should land near the injected noise level, poses near truth
        assert 0.2 < float(res.rms_px) < 1.0
        a1, t1 = pose_errors(np.array(res.poses), np.array(T))
        assert a1.max() < 0.5 and t1.max() < 0.02

    def test_gauge_fixed(self):
        rig, T, X, T0, X0, meas, vis = make_window()
        res = schur.ba_solve(T0, X0, meas, vis, rig, iters=8)
        np.testing.assert_allclose(np.array(res.poses[0]), np.eye(4),
                                   atol=1e-5)

    def test_jittable(self):
        rig, T, X, T0, X0, meas, vis = make_window(W=3, L=64)
        f = jax.jit(lambda a, b, c, d: schur.ba_solve(a, b, c, d, rig,
                                                      iters=5))
        res = f(T0, X0, meas, vis)
        assert res.poses.shape == (3, 4, 4)


class TestDistributedBA:
    def test_matches_single_device(self, devices):
        rig, T, X, T0, X0, meas, vis = make_window(L=256, noise_px=0.3,
                                                   seed=2)
        res1 = schur.ba_solve(T0, X0, meas, vis, rig, iters=10)
        mesh = distributed.make_mesh(8)
        res8 = distributed.ba_solve_sharded(mesh, T0, X0, meas, vis, rig,
                                            iters=10)
        np.testing.assert_allclose(np.array(res8.cost), np.array(res1.cost),
                                   rtol=1e-3)
        np.testing.assert_allclose(np.array(res8.poses),
                                   np.array(res1.poses), atol=1e-4)

    def test_recovers_window(self, devices):
        rig, T, X, T0, X0, meas, vis = make_window(L=512, seed=3)
        mesh = distributed.make_mesh(8)
        res = distributed.ba_solve_sharded(mesh, T0, X0, meas, vis, rig,
                                           iters=15)
        a1, t1 = pose_errors(np.array(res.poses), np.array(T))
        assert a1.max() < 0.05 and t1.max() < 2e-3

    def test_pad_landmarks(self):
        X0 = jnp.zeros((10, 3))
        meas = jnp.zeros((10, 3, 4))
        vis = jnp.ones((10, 3), bool)
        Xp, mp, vp = distributed.pad_landmarks(X0, meas, vis, 8)
        assert Xp.shape[0] == 16 and mp.shape[0] == 16
        assert not bool(vp[10:].any())
