import jax
import jax.numpy as jnp
import numpy as np
import pytest

from front_end_tpu.geometry import se3
from front_end_tpu.geometry.camera import bumblebee_rig
from front_end_tpu.motion import essential, kabsch, lm, ransac
from front_end_tpu.sim import synthetic as sim


def _world(n=512, seed=0, cat="medium"):
    rig = bumblebee_rig()
    w = sim.sample_world(jax.random.PRNGKey(seed), rig,
                         sim.motion_category(cat), n)
    return rig, w


def _motion_err(H_est, H_true):
    ang = np.degrees(float(se3.rotation_geodesic_error(
        jnp.asarray(H_est)[:3, :3], jnp.asarray(H_true)[:3, :3])))
    t = float(jnp.linalg.norm(jnp.asarray(H_est)[:3, 3]
                              - jnp.asarray(H_true)[:3, 3]))
    return ang, t


class TestKabsch:
    def test_exact_recovery(self):
        _, w = _world()
        H = kabsch.rigid_transform_3d(w.Xa, w.Xb, w.valid.astype(jnp.float32))
        ang, t = _motion_err(H, w.Ht)
        assert ang < 1e-3 and t < 1e-4

    def test_batched(self):
        rig = bumblebee_rig()
        ws = sim.sample_worlds(jax.random.PRNGKey(1), rig,
                               sim.motion_category("slow"), n=128, batch=4)
        H = jax.vmap(kabsch.rigid_transform_3d)(
            ws.Xa, ws.Xb, ws.valid.astype(jnp.float32))
        for i in range(4):
            ang, t = _motion_err(H[i], ws.Ht[i])
            assert ang < 0.1 and t < 1e-3

    def test_reflection_fix(self, rng):
        # co-planar-ish degenerate points should still give det(R)=+1
        Xa = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32)
                         * np.array([1.0, 1.0, 1e-4]))
        H = se3.se3_exp(jnp.array([0.1, 0.0, 0.2, 0.0, 3.0, 0.0]))
        Xb = se3.transform_points(H, Xa)
        Hh = kabsch.rigid_transform_3d(Xa, Xb)
        assert float(jnp.linalg.det(Hh[:3, :3])) > 0.99


class TestRigidRansac:
    @pytest.mark.parametrize("outlier_frac", [0.05, 0.25])
    def test_outlier_rejection(self, outlier_frac):
        rig, w = _world(n=512, seed=2)
        wo, out_mask = sim.add_outliers(jax.random.PRNGKey(5), w, rig,
                                        outlier_frac)
        res = ransac.rigid_ransac(jax.random.PRNGKey(9), wo.Xa, wo.Xb,
                                  wo.valid, threshold=0.05)
        ang, t = _motion_err(res.H, w.Ht)
        assert ang < 0.5 and t < 0.01
        # outliers excluded from consensus
        inl = np.array(res.inliers)
        assert (inl & np.array(out_mask)).sum() < 0.05 * np.array(out_mask).sum() + 3

    def test_noisy_data(self):
        rig, w = _world(n=512, seed=3)
        wn = sim.add_gaussian_noise(jax.random.PRNGKey(6), w, rig, 0.5)
        res = ransac.rigid_ransac(jax.random.PRNGKey(10), wn.Xa, wn.Xb,
                                  wn.valid, threshold=0.1)
        ang, t = _motion_err(res.H, w.Ht)
        assert ang < 2.0 and t < 0.05
        # depth noise grows ~z^2; only the nearer third of the cloud can
        # pass a 0.1 m alignment gate at 0.5 px pixel noise
        assert int(res.n_inliers) > 100

    def test_jittable(self):
        rig, w = _world(n=256)
        f = jax.jit(lambda k, a, b, v: ransac.rigid_ransac(k, a, b, v))
        res = f(jax.random.PRNGKey(0), w.Xa, w.Xb, w.valid)
        assert res.H.shape == (4, 4)


class TestEssential:
    def test_eight_point_epipolar_constraint(self):
        rig, w = _world(n=512, seed=4)
        f, pp = rig.fx, rig.pp
        xa = (w.uva[:, :2] - pp) / f
        xb = (w.uvb[:, :2] - pp) / f
        E = essential.eight_point(xa, xb)
        err = np.array(essential.sampson_error(E, xa, xb))
        assert np.median(err[np.array(w.valid)]) < 1e-5

    def test_scaled_motion_ideal(self):
        rig, w = _world(n=512, seed=5)
        res = essential.essential_scaled_motion(
            jax.random.PRNGKey(11), w.uva, w.uvb, w.Xa, w.Xb, w.valid, rig)
        ang, t = _motion_err(res.H, w.Ht)
        assert ang < 0.2
        assert t < 0.01
        assert int(res.n_inliers) > 0.9 * int(np.array(w.valid).sum())

    def test_scaled_motion_outliers(self):
        rig, w = _world(n=512, seed=6)
        wo, _ = sim.add_outliers(jax.random.PRNGKey(2), w, rig, 0.15)
        res = essential.essential_scaled_motion(
            jax.random.PRNGKey(12), wo.uva, wo.uvb, wo.Xa, wo.Xb, wo.valid,
            rig, threshold_px=1.0)
        ang, t = _motion_err(res.H, w.Ht)
        assert ang < 1.0 and t < 0.02

    def test_estimate_scale_closed_form(self, rng):
        # mean displacement collapse == reference pinv averaging
        R = np.array(se3.compose_R(2.0, -1.0, 3.0))
        T = np.array([0.01, -0.02, 0.3])
        Xa = rng.normal(size=(64, 3)).astype(np.float64)
        Xb = Xa @ R.T + T
        Tn = np.array(essential.estimate_scale(
            jnp.asarray(Xa), jnp.asarray(Xb), jnp.asarray(R),
            jnp.ones(64, bool)))
        np.testing.assert_allclose(Tn, T, atol=1e-5)


class TestMotionLM:
    def test_refines_perturbed_pose(self):
        rig, w = _world(n=256, seed=7)
        dx = jnp.array([0.02, -0.01, 0.03, 0.01, -0.015, 0.02])
        H0 = se3.se3_exp(dx) @ w.Ht
        res = lm.refine_motion(H0, w.Xa, w.uvb, w.valid, rig, iters=15)
        ang, t = _motion_err(res.H, w.Ht)
        assert ang < 0.05 and t < 2e-3
        assert float(res.cost) < float(res.cost0)

    def test_robust_to_outliers(self):
        rig, w = _world(n=512, seed=8)
        wo, _ = sim.add_outliers(jax.random.PRNGKey(4), w, rig, 0.1)
        dx = jnp.array([0.01, 0.01, -0.01, 0.005, 0.01, -0.005])
        H0 = se3.se3_exp(dx) @ w.Ht
        res = lm.refine_motion(H0, wo.Xa, wo.uvb, wo.valid, rig,
                               iters=20, huber_px=2.0)
        ang, t = _motion_err(res.H, w.Ht)
        assert ang < 0.3 and t < 0.01

    def test_jit_vmap(self):
        rig = bumblebee_rig()
        ws = sim.sample_worlds(jax.random.PRNGKey(3), rig,
                               sim.motion_category("slow"), n=128, batch=4)
        f = jax.jit(jax.vmap(
            lambda H0, Xa, uvb, v: lm.refine_motion(H0, Xa, uvb, v, rig).H))
        H = f(ws.Ht, ws.Xa, ws.uvb, ws.valid)
        assert H.shape == (4, 4, 4)
