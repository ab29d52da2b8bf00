"""Monte-Carlo estimator characterization — the operating-curve study.

Rebuild of the reference's batch simulation pipeline
(`/root/reference/bin/extractMotion:26-188`, `bin/extractNister:37-104`,
`bin/extractBA:32-52`): for every (motion speed × landmark-count curve ×
noise level × outlier fraction) condition, run the motion estimators on
synthetic worlds with known ground truth and record recovered-motion
errors.

Where the reference loops over pickled files one condition and one
hypothesis at a time (500 motions/condition, resumable by file
existence), here each condition is ONE vmapped device batch; results
land in an .npz per condition with the same skip-if-exists resume
semantics (`bin/extractMotion:59,79,103`).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from front_end_tpu.geometry import se3
from front_end_tpu.geometry.camera import StereoRig, bumblebee_rig
from front_end_tpu.motion import essential, lm, ransac
from front_end_tpu.sim import synthetic as sim
from front_end_tpu.utils.precision import f32_precision

SPEEDS = ("slow", "medium", "fast")
EXTRACTORS = ("PCL", "Nister", "BA", "WindowBA")


def _condition_batch(wkeys, rig, cat, n_points, noise_px,
                     outlier_frac, with_noise, with_outliers):
    """One condition: independent worlds with noise + outliers, one per
    row of `wkeys` (B, 2).  `with_noise`/`with_outliers` are STATIC
    apply flags (a zero sigma is NOT a no-op — the reference's noise
    model always adds U(0,1) to y); the magnitudes stay traced so one
    compilation serves every level.

    The per-world key axis is the DATA-PARALLEL axis: pass `wkeys`
    sharded over a mesh (see `run_study(devices=...)`) and XLA
    partitions every world independently — no collectives, the TPU
    rendition of the reference's embarrassingly-parallel condition
    fan-out (`bin/extractMotion:40-45`)."""
    def one(k):
        k1, k2, k3 = jax.random.split(k, 3)
        w = sim.sample_world(k1, rig, cat, n_points)
        if with_noise:
            w = sim.add_gaussian_noise(k2, w, rig, noise_px)
        out_mask = jnp.zeros((n_points,), bool)
        if with_outliers:
            w, out_mask = sim.add_outliers(k3, w, rig, outlier_frac)
        return w, out_mask

    return jax.vmap(one)(wkeys)


def _extract(method, key, w, rig, threshold):
    if method == "PCL":
        res = ransac.rigid_ransac(key, w.Xa, w.Xb, w.valid,
                                  threshold=threshold)
        return res.H, res.n_inliers
    if method == "Nister":
        res = essential.essential_scaled_motion(
            key, w.uva, w.uvb, w.Xa, w.Xb, w.valid, rig, threshold_px=3.0)
        return res.H, res.n_inliers
    if method == "BA":
        res = lm.refine_motion(jnp.eye(4), w.Xa, w.uvb, w.valid, rig,
                               iters=25, huber_px=3.0)
        return res.H, jnp.sum(w.valid)
    raise ValueError(method)


@functools.partial(jax.jit, static_argnames=(
    "n_points", "window", "iters", "huber_px", "with_noise",
    "with_outliers"))
@f32_precision
def _window_condition_jit(wkeys, rig: StereoRig, cat, n_points: int,
                          noise_px, outlier_frac, *,
                          window: int = 3,
                          iters: int = 20, huber_px: float = 3.0,
                          with_noise: bool = True,
                          with_outliers: bool = True):
    """Full-window simulated BA — the `bin/extractBA` study done right.

    The reference's `simulatedBA` optimizes the WHOLE window state
    (6-DoF poses + homogeneous landmark coordinates, scipy least_squares
    max_nfev 80 — `/root/reference/bin/extractBA:32-52`, spec
    `algorithm.py:455-527`); here the same state is optimized by the
    Schur-complement LM solver over `batch` vmapped windows per
    condition.  Initial state follows `extractMotion(resetMotion=True)`:
    already-estimated poses keep ground truth, the NEWEST pose resets to
    the previous frame's (zero motion), and landmarks re-triangulate
    from the noisy anchor-frame measurements."""
    from front_end_tpu.ba import schur

    def one(k):
        k1, k2, k3 = jax.random.split(k, 3)
        ww = sim.sample_window_world(k1, rig, cat, n_points, window)
        if with_noise:
            ww = sim.window_add_noise(k2, ww, noise_px)
        if with_outliers:
            ww, _ = sim.window_add_outliers(k3, ww, rig, outlier_frac)
        poses0 = ww.poses.at[-1].set(ww.poses[-2])     # reset newest
        X0 = rig.triangulate(ww.meas[:, 0, :2], ww.meas[:, 0, 2:])
        res = schur.ba_solve(poses0, X0, ww.meas,
                             ww.vis & ww.valid[:, None], rig,
                             iters=iters, huber_px=huber_px)
        # newest-pose relative motion vs ground truth
        rel_est = res.poses[-1] @ se3.invert_homog(res.poses[-2])
        rel_gt = ww.poses[-1] @ se3.invert_homog(ww.poses[-2])
        ang = se3.rotation_geodesic_error(rel_est[:3, :3], rel_gt[:3, :3])
        terr = jnp.linalg.norm(rel_est[:3, 3] - rel_gt[:3, 3])
        return (jnp.degrees(ang), terr,
                jnp.sum(ww.vis & ww.valid[:, None]), res.rms_px)

    return jax.vmap(one)(wkeys)


def _world_keys(key, batch, mesh=None):
    """(B, 2) per-world keys, optionally sharded over `mesh`'s "worlds"
    axis — the only step needed for device-parallel conditions: jit
    propagates the argument sharding and every world runs on its shard."""
    wkeys = jax.random.split(key, batch)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        wkeys = jax.device_put(wkeys, NamedSharding(mesh, P("worlds")))
    return wkeys


def run_window_condition(key, rig: StereoRig, speed: str, n_points: int,
                         noise_px: float, outlier_frac: float, *,
                         window: int = 3, batch: int = 64,
                         iters: int = 20, huber_px: float = 3.0,
                         mesh=None):
    """numpy wrapper over the jitted window-condition body (one compiled
    program per (shape, noise-branch) combination; eager dispatch costs
    ~0.7 ms/op through the remote TPU tunnel, ~20 s per condition)."""
    ang, terr, n_obs, rms = _window_condition_jit(
        _world_keys(key, batch, mesh), rig, sim.motion_category(speed),
        n_points=int(n_points),
        noise_px=jnp.float32(noise_px),
        outlier_frac=jnp.float32(outlier_frac),
        window=window, iters=iters, huber_px=huber_px,
        with_noise=noise_px > 0, with_outliers=outlier_frac > 0)
    return {"rot_err_deg": np.asarray(ang),
            "trans_err_m": np.asarray(terr),
            "n_inliers": np.asarray(n_obs),
            "window_rms_px": np.asarray(rms)}


@functools.partial(jax.jit, static_argnames=(
    "method", "n_points", "threshold", "with_noise",
    "with_outliers"))
@f32_precision
def _condition_jit(wkeys, method: str, rig: StereoRig, cat,
                   n_points: int, noise_px, outlier_frac,
                   threshold: float = 0.08, *,
                   with_noise: bool = True, with_outliers: bool = True):
    worlds, out_mask = _condition_batch(wkeys, rig, cat, n_points,
                                        noise_px, outlier_frac,
                                        with_noise, with_outliers)
    ekeys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(wkeys)

    def one(k, w):
        H, n_inl = _extract(method, k, w, rig, threshold)
        ang = se3.rotation_geodesic_error(H[:3, :3], w.Ht[:3, :3])
        terr = jnp.linalg.norm(H[:3, 3] - w.Ht[:3, 3])
        return jnp.degrees(ang), terr, n_inl

    return jax.vmap(one)(ekeys, worlds)


def run_condition(key, method: str, rig: StereoRig, speed: str,
                  n_points: int, noise_px: float, outlier_frac: float,
                  batch: int = 64, threshold: float = 0.08, mesh=None):
    """Returns per-world absolute motion errors: dict of arrays (batch,).
    One fully-jitted program per condition shape (see wrapper note on
    `run_window_condition`)."""
    ang, terr, n_inl = _condition_jit(
        _world_keys(key, batch, mesh), method, rig,
        sim.motion_category(speed),
        n_points=int(n_points), noise_px=jnp.float32(noise_px),
        outlier_frac=jnp.float32(outlier_frac),
        threshold=threshold,
        with_noise=noise_px > 0, with_outliers=outlier_frac > 0)
    return {"rot_err_deg": np.asarray(ang),
            "trans_err_m": np.asarray(terr),
            "n_inliers": np.asarray(n_inl)}


def run_study(out_dir: str, *, methods=EXTRACTORS, speeds=SPEEDS,
              curves=sim.OPERATING_CURVES, noises=(0.0,) + sim.NOISE_LEVELS,
              outliers=(0.0,) + sim.OUTLIER_LEVELS, batch: int = 64,
              rig: StereoRig | None = None, seed: int = 0,
              ideal_only: bool = False, verbose: bool = True,
              devices: int | None = None):
    """The full `extractMotion` grid.  Resumable: conditions whose .npz
    exists are skipped (`bin/extractMotion:59`).

    devices > 1 shards each condition's world batch over that many
    devices (data parallelism over independent Monte-Carlo worlds; the
    batch is rounded up to a multiple of the mesh size)."""
    rig = rig or bumblebee_rig()
    os.makedirs(out_dir, exist_ok=True)
    mesh = None
    if devices and devices > 1:
        from jax.sharding import Mesh
        devs = jax.devices()[:devices]
        if len(devs) < devices:
            raise ValueError(f"need {devices} devices, have {len(devs)}")
        mesh = Mesh(np.array(devs), ("worlds",))
        batch = -(-batch // devices) * devices
    done, ran = 0, 0
    if ideal_only:
        noises, outliers = (0.0,), (0.0,)
    for method in methods:
        for speed in speeds:
            for n_points in curves:
                for noise in noises:
                    for frac in outliers:
                        name = (f"{method}_{speed}_{n_points:05d}"
                                f"_n{noise:g}_o{frac:g}.npz")
                        path = os.path.join(out_dir, name)
                        if os.path.exists(path):
                            done += 1
                            continue
                        key = jax.random.fold_in(
                            jax.random.PRNGKey(seed), hash(name) % (2**31))
                        if method == "WindowBA":
                            res = run_window_condition(
                                key, rig, speed, int(n_points), noise,
                                frac, batch=batch, mesh=mesh)
                        else:
                            res = run_condition(key, method, rig, speed,
                                                int(n_points), noise, frac,
                                                batch=batch, mesh=mesh)
                        np.savez(path, **res)
                        ran += 1
                        if verbose:
                            print(f"{name}: rot_med="
                                  f"{np.median(res['rot_err_deg']):.4f}deg "
                                  f"trans_med="
                                  f"{np.median(res['trans_err_m'])*1000:.2f}mm")
    return {"ran": ran, "skipped": done}


def load_study(out_dir: str):
    """Aggregate all condition files into a nested dict for plotting —
    the `analysis.py getOperatingCurves` capability."""
    out = {}
    for name in sorted(os.listdir(out_dir)):
        if not name.endswith(".npz"):
            continue
        stem = name[:-4]
        method, speed, pts, n, o = stem.split("_")
        with np.load(os.path.join(out_dir, name)) as z:
            out.setdefault(method, {}).setdefault(speed, {})[
                (int(pts), float(n[1:]), float(o[1:]))] = {
                    k: z[k].copy() for k in z.files}
    return out
