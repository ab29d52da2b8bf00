import jax
import jax.numpy as jnp
import numpy as np

from front_end_tpu.geometry import se3
from front_end_tpu.geometry.camera import bumblebee_rig
from front_end_tpu.sim import synthetic as sim


def _world(n=256, seed=0, cat="slow"):
    rig = bumblebee_rig()
    key = jax.random.PRNGKey(seed)
    w = sim.sample_world(key, rig, sim.motion_category(cat), n)
    return rig, w


def test_sample_world_valid_and_consistent():
    rig, w = _world()
    v = np.array(w.valid)
    assert v.mean() > 0.95, "oversampling should fill nearly all rows"
    # Xb == Ht @ Xa
    Xb = np.array(se3.transform_points(w.Ht, w.Xa))
    np.testing.assert_allclose(Xb[v], np.array(w.Xb)[v], atol=1e-4)
    # projections consistent with camera model
    uva = np.array(rig.project4(w.Xa))
    np.testing.assert_allclose(uva[v], np.array(w.uva)[v], atol=1e-2)
    # all valid pixels in image, positive depth
    uv = np.array(w.uva)[v]
    assert (uv[:, 0] > 0).all() and (uv[:, 0] < rig.width).all()
    assert (np.array(w.Xa)[v][:, 2] > 0).all()


def test_h_and_ht_relationship():
    _, w = _world()
    # Ht = [R | -R T]  where H = [R | T]
    H, Ht = np.array(w.H), np.array(w.Ht)
    np.testing.assert_allclose(Ht[:3, :3], H[:3, :3], atol=1e-6)
    np.testing.assert_allclose(Ht[:3, 3], -H[:3, :3] @ H[:3, 3], atol=1e-6)


def test_motion_magnitude_by_category():
    rig = bumblebee_rig()
    for name, tmean in [("slow", 0.022), ("medium", 0.044), ("fast", 0.066)]:
        keys = jax.random.split(jax.random.PRNGKey(1), 200)
        H, _ = jax.vmap(lambda k: sim.sample_motion(
            k, sim.motion_category(name)))(keys)
        tz = np.array(H)[:, 2, 3]
        assert abs(tz.mean() - tmean) < 0.3 * tmean + 3 * 0.1 * tmean / np.sqrt(200)


def test_gaussian_noise_statistics():
    rig, w = _world(n=2048)
    key = jax.random.PRNGKey(7)
    sigma = 1.5
    wn = sim.add_gaussian_noise(key, w, rig, sigma)
    dx = np.array(wn.uva[:, 0] - w.uva[:, 0])
    dy = np.array(wn.uva[:, 1] - w.uva[:, 1])
    assert abs(dx.std() - sigma) < 0.15 * sigma
    assert 0.0 <= dy.min() and dy.max() <= 1.0       # reference: y += U(0,1)
    # 3D points were re-triangulated -> perturbed
    assert np.abs(np.array(wn.Xa - w.Xa)).max() > 0


def test_outlier_injection():
    rig, w = _world(n=1024)
    wn, mask = sim.add_outliers(jax.random.PRNGKey(3), w, rig, 0.2)
    m = np.array(mask)
    frac = m.sum() / np.array(w.valid).sum()
    assert 0.12 < frac < 0.28
    # outliers moved by at least the minimum shift in both axes
    d = np.abs(np.array(wn.uvb[:, :2] - w.uvb[:, :2]))
    assert (d[m] > sim.MIN_OUTLIER_SHIFT).all()
    # non-outliers untouched
    np.testing.assert_allclose(np.array(wn.uvb)[~m & np.array(w.valid)],
                               np.array(w.uvb)[~m & np.array(w.valid)])


def test_sample_worlds_vmapped():
    rig = bumblebee_rig()
    ws = sim.sample_worlds(jax.random.PRNGKey(0), rig,
                           sim.motion_category("medium"), n=128, batch=8)
    assert ws.Xa.shape == (8, 128, 3)
    assert ws.H.shape == (8, 4, 4)
    # independent motions
    assert np.abs(np.array(ws.H[0] - ws.H[1])).max() > 1e-6


def test_triangulation_closes_loop():
    """Triangulating the ideal projections recovers the landmarks — the
    reference's XaQPred check (`~simulation.py:506-521`)."""
    rig, w = _world()
    v = np.array(w.valid)
    Xa = np.array(rig.triangulate(w.uva[:, :2], w.uva[:, 2:]))
    np.testing.assert_allclose(Xa[v], np.array(w.Xa)[v], rtol=5e-3, atol=5e-3)
