"""Synthetic stereo-landmark world — the framework's fake-world test backend.

TPU-native rebuild of the reference's Monte-Carlo harness
(`/root/reference/src/front_end/~simulation.py`): known ground-truth motion,
in-frustum stereo landmarks, controlled Gaussian pixel noise and outlier
contamination.  Where the reference rejection-samples one landmark at a time
in Python loops (`~simulation.py:283-367,484-522`), we draw a fixed
oversample batch, score validity, and gather the first N valid rows —
static shapes, one fused XLA program, vmappable over motions.

Reference parameter contracts kept exactly:
- motion categories Slow/Medium/Fast (`~simulation.py:51-70`):
  translation mean 0.022/0.044/0.066 m dominant +Z, noise 10 % of mean,
  rotation noise 1/4/8 degrees ('szxy' Euler, zero-mean normal);
- landmark prior x,y ~ N(0,5), z ~ N(0,4) (`~simulation.py:288-290`);
- validity: all four projections inside the image, Za, Zb > 0
  (`~simulation.py:249-261`);
- noise model (`~simulation.py:314-341`): x += N(0, sigma), y += U(0,1) on
  every projection, then re-triangulation of Xa/Xb from the noisy pixels;
- outlier model (`~simulation.py:343-366`): replace the left projection by a
  uniform image point at least 3 px from the true one;
- noise grid sigma in {0.25..2.5} px, outlier fractions {5..25} %
  (`~simulation.py:18-26`).

Ground truth transform conventions follow `~simulation.py:424-429`:
`H = createHomog(R, T)` is the reported pose; `Ht = composeTransform(R, T)
= [R | -R T]` is the extrinsic map Xb = Ht @ Xa that generates the data.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from front_end_tpu.geometry import se3
from front_end_tpu.geometry.camera import StereoRig
from front_end_tpu.utils.precision import f32_precision

NOISE_LEVELS = (0.25, 0.5, 0.75, 1.0, 1.5, 2.0, 2.5)       # px sigma
OUTLIER_LEVELS = (0.05, 0.10, 0.15, 0.20, 0.25)            # fraction
OPERATING_CURVES = (100, 250, 500, 1000, 2500)             # landmark counts
MIN_OUTLIER_SHIFT = 3.0                                    # px


@struct.dataclass
class MotionCategory:
    translation_mean: jnp.ndarray      # metres, dominant +Z
    translation_noise: jnp.ndarray     # metres (sigma)
    rotation_noise_deg: jnp.ndarray    # degrees (sigma, all three angles)


def motion_category(name: str) -> MotionCategory:
    table = {
        "slow": (0.022, 1.0),
        "medium": (0.044, 4.0),
        "fast": (0.066, 8.0),
    }
    tm, rn = table[name.lower()]
    return MotionCategory(
        translation_mean=jnp.float32(tm),
        translation_noise=jnp.float32(0.1 * tm),
        rotation_noise_deg=jnp.float32(rn))


class StereoWorld(NamedTuple):
    """A batch of ground-truth stereo landmark correspondences.

    All arrays have leading dim N (static); `valid` masks real rows.
    Pixel tensors are [ul, vl, ur, vr] per frame, matching the BA
    measurement layout (`sba_solver.cpp:57-86`).
    """
    H: jnp.ndarray            # (4,4) ground truth pose  (createHomog(R,T))
    Ht: jnp.ndarray           # (4,4) extrinsic map a->b ([R | -R T])
    Xa: jnp.ndarray           # (N,3) landmarks in frame a
    Xb: jnp.ndarray           # (N,3) landmarks in frame b (= Ht·Xa)
    uva: jnp.ndarray          # (N,4) pixels frame a [ul,vl,ur,vr]
    uvb: jnp.ndarray          # (N,4) pixels frame b
    valid: jnp.ndarray        # (N,) bool


def sample_motion(key, cat: MotionCategory):
    """Reference `noisyRotations` + `dominantTranslation`
    (`~simulation.py:108-131`): zero-mean szxy Euler rotation, dominant-Z
    translation with |Z| ~ folded normal.  Returns (H, Ht)."""
    kr, kt = jax.random.split(key)
    ang = jax.random.normal(kr, (3,)) * cat.rotation_noise_deg
    R = se3.compose_R(ang[0], ang[1], ang[2], degrees=True)
    txy = jax.random.normal(kt, (3,)) * cat.translation_noise
    tz = jnp.abs(txy[2] + cat.translation_mean)
    T = jnp.stack([txy[0], txy[1], tz])
    return se3.create_homog(R, T), se3.compose_transform(R, T)


def _project_pair(rig: StereoRig, X):
    l, r = rig.project(X)
    return jnp.concatenate([l, r], -1)


def _validity(rig: StereoRig, Xa, Xb, uva, uvb):
    def in_img(uv):
        ok_l = ((uv[..., 0] > 0) & (uv[..., 0] < rig.width)
                & (uv[..., 1] > 0) & (uv[..., 1] < rig.height))
        ok_r = ((uv[..., 2] > 0) & (uv[..., 2] < rig.width)
                & (uv[..., 3] > 0) & (uv[..., 3] < rig.height))
        return ok_l & ok_r
    return (in_img(uva) & in_img(uvb)
            & (Xa[..., 2] > 0) & (Xb[..., 2] > 0))


@f32_precision
def sample_world(key, rig: StereoRig, cat: MotionCategory, n: int,
                 oversample: int = 48) -> StereoWorld:
    """Generate N valid in-frustum stereo landmarks under a random motion.

    Rejection sampling is replaced by drawing `oversample*n` candidates and
    stably gathering valid rows first.  The reference's landmark prior
    (x,y~N(0,5), z~N(0,4)) lands only ~4 % of draws inside both frusta, so
    oversample=48 keeps the expected shortfall negligible at n >= 100; any
    shortfall is flagged in `valid`.
    """
    km, kp = jax.random.split(key)
    H, Ht = sample_motion(km, cat)

    m = oversample * n
    kx, ky, kz = jax.random.split(kp, 3)
    X = jnp.stack([jax.random.normal(kx, (m,)) * 5.0,
                   jax.random.normal(ky, (m,)) * 5.0,
                   jax.random.normal(kz, (m,)) * 4.0], -1)
    Xb = se3.transform_points(Ht, X)
    uva = _project_pair(rig, X)
    uvb = _project_pair(rig, Xb)
    ok = _validity(rig, X, Xb, uva, uvb)

    # stable "valid rows first" gather
    order = jnp.argsort(~ok, stable=True)[:n]
    valid = ok[order]
    return StereoWorld(H=H, Ht=Ht,
                       Xa=X[order], Xb=Xb[order],
                       uva=uva[order], uvb=uvb[order], valid=valid)


@f32_precision
def add_gaussian_noise(key, world: StereoWorld, rig: StereoRig,
                       sigma) -> StereoWorld:
    """Reference noise injector (`~simulation.py:314-341`): per projection
    x += N(0, sigma), y += U(0,1); Xa/Xb re-triangulated from the noisy
    pixels (so the 3D points carry the pixel noise, as in the reference)."""
    n = world.uva.shape[0]
    kxa, kya, kxb, kyb = jax.random.split(key, 4)

    def noisy(uv, kx, ky):
        dx = jax.random.normal(kx, (n, 2)) * sigma          # ul, ur
        dy = jax.random.uniform(ky, (n, 2))                 # vl, vr
        return uv + jnp.stack([dx[:, 0], dy[:, 0], dx[:, 1], dy[:, 1]], -1)

    uva = noisy(world.uva, kxa, kya)
    uvb = noisy(world.uvb, kxb, kyb)
    Xa = rig.triangulate(uva[:, :2], uva[:, 2:])
    Xb = rig.triangulate(uvb[:, :2], uvb[:, 2:])
    return world._replace(uva=uva, uvb=uvb, Xa=Xa, Xb=Xb)


@f32_precision
def add_outliers(key, world: StereoWorld, rig: StereoRig,
                 fraction) -> tuple[StereoWorld, jnp.ndarray]:
    """Reference outlier injector (`~simulation.py:343-366`): for a random
    `fraction` of rows, replace the frame-b left projection with a uniform
    image point at least MIN_OUTLIER_SHIFT px away (both axes) from the true
    one, re-derive the right view x uniformly, and re-triangulate Xb.

    Returns (world', outlier_mask).  The mask is ground truth for RANSAC
    consensus tests.
    """
    n = world.uvb.shape[0]
    ksel, kpt, krx = jax.random.split(key, 3)
    is_out = jax.random.uniform(ksel, (n,)) < fraction

    # Draw K candidate points per row; take the first satisfying the
    # min-shift constraint (reference keeps re-drawing; 8 candidates drive
    # the failure probability below 1e-6 for any true point).
    K = 8
    cand = jax.random.uniform(kpt, (n, K, 2)) * jnp.array(
        [rig.width, rig.height], jnp.float32)
    diff = jnp.abs(cand - world.uvb[:, None, :2])
    far = (diff[..., 0] > MIN_OUTLIER_SHIFT) & (diff[..., 1] > MIN_OUTLIER_SHIFT)
    pick = jnp.argmax(far, axis=1)
    pt = jnp.take_along_axis(cand, pick[:, None, None], axis=1)[:, 0]

    rx = jax.random.uniform(krx, (n,)) * rig.width
    uvb_out = jnp.stack([pt[:, 0], pt[:, 1], rx, pt[:, 1]], -1)
    uvb = jnp.where(is_out[:, None], uvb_out, world.uvb)
    Xb = rig.triangulate(uvb[:, :2], uvb[:, 2:])
    return world._replace(uvb=uvb, Xb=Xb), is_out & world.valid


@f32_precision
def sample_worlds(key, rig: StereoRig, cat: MotionCategory, n: int,
                  batch: int, **kw):
    """vmapped batch of independent worlds — replaces the reference's
    500-motions-per-condition file grid (`bin/extractMotion:40-117`)."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: sample_world(k, rig, cat, n, **kw))(keys)


class WindowWorld(NamedTuple):
    """A W-frame sliding-window ground-truth problem — the state the
    reference's full-window BA optimizes (`slidingWindow` spec,
    `/root/reference/src/front_end/algorithm.py:455-527`: X = poses +
    4N landmark coords, M = 4F×N measurement matrix).

    Frame 0 is the world frame; `poses[w]` is camera_from_world of frame
    w (poses[0] = I).  `meas` follows the BA layout [ul,vl,ur,vr]."""
    poses: jnp.ndarray        # (W, 4, 4) ground-truth extrinsics
    X: jnp.ndarray            # (N, 3) landmarks in frame-0/world frame
    meas: jnp.ndarray         # (N, W, 4) pixel measurements
    vis: jnp.ndarray          # (N, W) bool — in-frustum at frame w
    valid: jnp.ndarray        # (N,) bool — real landmark row


@f32_precision
def sample_window_world(key, rig: StereoRig, cat: MotionCategory, n: int,
                        window: int = 3, oversample: int = 48
                        ) -> WindowWorld:
    """W-frame analogue of `sample_world`: one landmark cloud observed
    from a chain of `window` poses whose per-step motion follows the
    category's noisy-rotation/dominant-translation model
    (`~simulation.py:108-131`).  Landmarks must be visible in frame 0;
    per-frame visibility thereafter is carried in `vis` (the reference's
    window spec assumes always-tracked features — `algorithm.py:512` "no
    masking available" — the mask here is the static-shape upgrade)."""
    km, kp = jax.random.split(key)
    Hts = []
    T = jnp.eye(4)
    poses = [T]
    for w in range(window - 1):
        km, k = jax.random.split(km)
        _, Ht = sample_motion(k, cat)
        T = Ht @ T
        poses.append(T)
    poses = jnp.stack(poses)                                 # (W,4,4)

    m = oversample * n
    kx, ky, kz = jax.random.split(kp, 3)
    X = jnp.stack([jax.random.normal(kx, (m,)) * 5.0,
                   jax.random.normal(ky, (m,)) * 5.0,
                   jax.random.normal(kz, (m,)) * 4.0], -1)   # (m,3)

    Xw = jax.vmap(lambda Tw: se3.transform_points(Tw, X))(poses)  # (W,m,3)
    meas = jnp.swapaxes(jax.vmap(rig.project4)(Xw), 0, 1)    # (m,W,4)
    vis = jnp.swapaxes(jax.vmap(rig.in_view)(Xw), 0, 1)      # (m,W)

    # rows visible in every frame first (the reference's always-tracked
    # assumption), then frame-0-visible rows
    ok0 = vis[:, 0]
    ok_all = jnp.all(vis, axis=1)
    order = jnp.argsort(~ok_all * 2 + ~ok0 * 2, stable=True)[:n]
    return WindowWorld(poses=poses, X=X[order], meas=meas[order],
                       vis=vis[order] & ok0[order, None],
                       valid=ok0[order])


@f32_precision
def window_add_noise(key, ww: WindowWorld, sigma) -> WindowWorld:
    """Per-observation pixel noise, same model as `add_gaussian_noise`
    (x += N(0, sigma), y += U(0,1)) applied to every frame's measurement."""
    kx, ky = jax.random.split(key)
    n, W, _ = ww.meas.shape
    dx = jax.random.normal(kx, (n, W, 2)) * sigma
    dy = jax.random.uniform(ky, (n, W, 2))
    noise = jnp.stack([dx[..., 0], dy[..., 0], dx[..., 1], dy[..., 1]], -1)
    return ww._replace(meas=ww.meas + noise)


@f32_precision
def window_add_outliers(key, ww: WindowWorld, rig: StereoRig, fraction):
    """Replace a `fraction` of non-anchor observations (frames >= 1) with
    uniform image points >= MIN_OUTLIER_SHIFT px off, per the reference's
    outlier model (`~simulation.py:343-366`).  Returns (ww', mask (N,W))."""
    n, W, _ = ww.meas.shape
    ksel, kpt, krx = jax.random.split(key, 3)
    is_out = (jax.random.uniform(ksel, (n, W)) < fraction
              ).at[:, 0].set(False)
    cand = jax.random.uniform(kpt, (n, W, 2)) * jnp.array(
        [rig.width, rig.height], jnp.float32)
    shift = jnp.maximum(jnp.abs(cand - ww.meas[..., :2]),
                        MIN_OUTLIER_SHIFT + 1.0)
    pt = ww.meas[..., :2] + jnp.sign(cand - ww.meas[..., :2] + 0.5) * shift
    pt = jnp.clip(pt, 0.0, jnp.array([rig.width - 1.0, rig.height - 1.0]))
    rx = jax.random.uniform(krx, (n, W)) * rig.width
    out_meas = jnp.stack([pt[..., 0], pt[..., 1], rx, pt[..., 1]], -1)
    meas = jnp.where(is_out[..., None], out_meas, ww.meas)
    return ww._replace(meas=meas), is_out & ww.vis
