"""The stereo visual-odometry frame pipeline — one jit-compiled step.

This is the TPU-native replacement for the reference's entire ROS node
graph (`detect_node` → `stereo_node` → `window_node`/`WindowMatcher`):
what the reference spreads over processes, topics and worker threads
(`live_stereo.cpp:126-404`, `StereoCamera.cpp:143-381`,
`WindowMatcher.cpp:75-336`) is here a single pure function

    vo_step : (VOState, stereo pair) -> (VOState, VOFrameOutput)

traced once by XLA and scanned over a sequence.  Every stage keeps static
shapes; the adaptive detector thresholds, the previous frame's features
and the integrated pose ride in the carried state.

Stage map (reference call sites in parentheses):
  1. adaptive grid FAST on L and R, batched     (live_stereo.cpp:277-318)
  2. optional cornerSubPix refinement           (live_stereo.cpp:321-337)
  3. BRIEF/ORB description, batched             (live_stereo.cpp:358-360)
  4. stereo match: Hamming crossCheck + epi gate (live_stereo.cpp:364-377)
  5. Q triangulation of matched pairs           (WindowMatcher.cpp:36-51)
  6. inter-frame match vs previous left feats   (WindowMatcher.cpp:104-224)
  7. egomotion: 3-pt rigid RANSAC (+ LM polish)  (svdRANSAC capability,
     algorithm.py:1196; WindowMatcher.cpp:247-302 for the essential path)
  8. pose integration
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from front_end_tpu.geometry import se3
from front_end_tpu.geometry.camera import StereoRig
from front_end_tpu.motion import essential as essential_mod
from front_end_tpu.motion import lm as lm_mod
from front_end_tpu.motion import ransac as ransac_mod
from front_end_tpu.ops import brief as brief_mod
from front_end_tpu.ops.dense_select import lookup, take_rows
from front_end_tpu.ops import grid as grid_mod
from front_end_tpu.ops import match as match_mod
from front_end_tpu.ops import orb as orb_mod
from front_end_tpu.ops import subpix as subpix_mod
from front_end_tpu.types import Descriptors, Keypoints
from front_end_tpu.utils.precision import f32_precision


# live descriptor registry — the reference's benchmarked swap set
# (`/root/reference/bin/detect_node:24-54`: BRIEF16/64, SURF,
# SURF_EXTENDED, FREAK, ORB) plus BRISK.  norm selects the matcher
# distance (`src/StereoCamera.cpp:497-516` picks NORM by descriptor);
# dim=None means 8*desc_bytes; border is the descriptor's sampling
# radius (keypoints closer to an edge than this are dropped, cv2's
# border-rejection behavior).
DESCRIPTORS = {
    "brief": dict(norm="hamming", dim=None, border=None),
    "brief_pallas": dict(norm="hamming", dim=None, border=None),
    "orb": dict(norm="hamming", dim=None, border=None),
    "surf": dict(norm="l2", dim=64, border=24),
    "surf_ext": dict(norm="l2", dim=128, border=24),
    "freak": dict(norm="hamming", dim=512, border=30),
    "brisk": dict(norm="hamming", dim=512, border=30),
}


@struct.dataclass
class VOConfig:
    grid: grid_mod.GridConfig = struct.field(
        pytree_node=False, default_factory=grid_mod.GridConfig)
    descriptor: str = struct.field(pytree_node=False, default="brief")
    desc_bytes: int = struct.field(pytree_node=False, default=32)
    subpix: bool = struct.field(pytree_node=False, default=False)
    epi_threshold: float = struct.field(pytree_node=False, default=0.7)
    max_disparity: float = struct.field(pytree_node=False, default=192.0)
    track_box: float = struct.field(pytree_node=False, default=100.0)
    lowe_ratio: float = struct.field(pytree_node=False, default=0.8)
    ransac_hyps: int = struct.field(pytree_node=False, default=384)
    ransac_threshold: float = struct.field(pytree_node=False, default=0.08)
    motion: str = struct.field(pytree_node=False, default="rigid")  # |essential
    lm_refine: bool = struct.field(pytree_node=False, default=True)
    lm_iters: int = struct.field(pytree_node=False, default=6)
    min_track_inliers: int = struct.field(pytree_node=False, default=12)

    @property
    def desc_dim(self) -> int:
        d = DESCRIPTORS[self.descriptor]["dim"]
        return d if d is not None else 8 * self.desc_bytes

    @property
    def desc_norm(self) -> str:
        return DESCRIPTORS[self.descriptor]["norm"]


class FrameFeatures(NamedTuple):
    """Per-frame feature state carried to the next step (capacity N)."""
    kps: Keypoints            # left keypoints
    bits: jnp.ndarray         # left descriptor bits (N, D)
    X: jnp.ndarray            # (N, 3) stereo-triangulated landmarks
    stereo_valid: jnp.ndarray  # (N,) had a stereo match
    uv4: jnp.ndarray          # (N, 4) [ul,vl,ur,vr] of the stereo match


class VOState(NamedTuple):
    thresholds_l: jnp.ndarray   # (Gr, Gc) adaptive controller state
    thresholds_r: jnp.ndarray
    prev: FrameFeatures
    pose: jnp.ndarray           # (4,4) world_T_camera of current frame
    frame_idx: jnp.ndarray      # () int32
    key: jnp.ndarray            # PRNG key for RANSAC


class VOFrameOutput(NamedTuple):
    pose: jnp.ndarray           # (4,4) world_T_camera after this frame
    motion: jnp.ndarray         # (4,4) extrinsic map prev->cur
    n_detect_l: jnp.ndarray
    n_detect_r: jnp.ndarray
    n_stereo: jnp.ndarray       # stereo matches this frame
    n_tracks: jnp.ndarray       # inter-frame track candidates
    n_inliers: jnp.ndarray      # motion consensus size
    motion_ok: jnp.ndarray      # bool — enough inliers to trust the motion
    # live-debug surfaces (the reference publishes drawn match/track
    # images every frame — features.py:752-760, algorithm.py:1198-1202;
    # these stay on device unless a debug consumer fetches them):
    track_xy_prev: jnp.ndarray  # (N, 2) prev-frame position of each track
    track_valid: jnp.ndarray    # (N,) inter-frame candidate mask
    track_inliers: jnp.ndarray  # (N,) motion-consensus mask


def init_state(rig: StereoRig, cfg: VOConfig, seed: int = 0) -> VOState:
    n = cfg.grid.capacity
    d = cfg.desc_dim
    feats = FrameFeatures(
        kps=Keypoints.empty(n),
        bits=jnp.zeros((n, d), jnp.float32),
        X=jnp.zeros((n, 3), jnp.float32),
        stereo_valid=jnp.zeros((n,), bool),
        uv4=jnp.zeros((n, 4), jnp.float32))
    return VOState(
        thresholds_l=cfg.grid.init_thresholds(),
        thresholds_r=cfg.grid.init_thresholds(),
        prev=feats,
        pose=jnp.eye(4),
        frame_idx=jnp.int32(0),
        key=jax.random.PRNGKey(seed))


def _extract_frame(left, right, tl, tr, rig: StereoRig, cfg: VOConfig):
    """Stages 1-5: detection, description, stereo matching, triangulation."""
    detl, detr = grid_mod.detect_pair(left, right, tl, tr, cfg.grid)
    kl, kr = detl.keypoints, detr.keypoints

    if cfg.subpix:
        # sub-pixel cap: unbounded cornerSubPix drift measured 10x worse
        # ATE on the rendered-world regression; caps swept there — 0.3
        # is the neutral point (1.03x), larger caps drift (see
        # ops/subpix.py and tests/test_rendered_world.py)
        kl = kl.replace(xy=subpix_mod.corner_subpix(
            left, kl.xy, kl.valid, max_shift=0.3))
        kr = kr.replace(xy=subpix_mod.corner_subpix(
            right, kr.xy, kr.valid, max_shift=0.3))

    # descriptor border validity (per-descriptor sampling radius)
    border = DESCRIPTORS[cfg.descriptor]["border"]
    bkw = {} if border is None else dict(border=border)
    bl = brief_mod.valid_mask(kl.xy, rig.width, rig.height, **bkw)
    br = brief_mod.valid_mask(kr.xy, rig.width, rig.height, **bkw)
    kl = kl.replace(valid=kl.valid & bl)
    kr = kr.replace(valid=kr.valid & br)

    if cfg.descriptor == "orb":
        sml, smr = brief_mod.smooth(left), brief_mod.smooth(right)
        angl = orb_mod.intensity_centroid_angle(left, kl.xy)
        angr = orb_mod.intensity_centroid_angle(right, kr.xy)
        kl = kl.replace(angle=angl)
        kr = kr.replace(angle=angr)
        dl = orb_mod.describe(sml, kl.xy, angl, cfg.desc_bytes)
        dr = orb_mod.describe(smr, kr.xy, angr, cfg.desc_bytes)
    elif cfg.descriptor in ("surf", "surf_ext"):
        # float descriptor, L2-matched — the reference's SURF /
        # SURF_EXTENDED live configs (`bin/detect_node:33-38`)
        from front_end_tpu.ops import surf as surf_mod
        ext = cfg.descriptor == "surf_ext"
        dl = surf_mod.describe(left, kl.xy, extended=ext, upright=True)
        dr = surf_mod.describe(right, kr.xy, extended=ext, upright=True)
    elif cfg.descriptor == "freak":
        from front_end_tpu.ops import freak as freak_mod
        angl = freak_mod.orientations(left, kl.xy, kl.valid)
        angr = freak_mod.orientations(right, kr.xy, kr.valid)
        dl = freak_mod.describe(left, kl.xy, angl, kl.valid)
        dr = freak_mod.describe(right, kr.xy, angr, kr.valid)
    elif cfg.descriptor == "brisk":
        from front_end_tpu.ops import brisk as brisk_mod
        angl = brisk_mod.orientations(left, kl.xy, kl.valid)
        angr = brisk_mod.orientations(right, kr.xy, kr.valid)
        dl = brisk_mod.describe(left, kl.xy, angl, kl.valid)
        dr = brisk_mod.describe(right, kr.xy, angr, kr.valid)
    elif cfg.descriptor == "brief_pallas" and jax.default_backend() == "tpu":
        from front_end_tpu.ops.pallas import brief_kernel
        sml, smr = brief_mod.smooth(left), brief_mod.smooth(right)
        dl, dr = brief_kernel.describe_pair_pallas(
            sml, smr, kl.xy, kr.xy, cfg.desc_bytes)
    else:
        # Production BRIEF path: dense pad-once bitplanes.  XLA's
        # fusion beats the Pallas roll kernel here — measured end-to-end
        # fetch-synchronized (round 4): 279 fps dense vs 213 fps
        # brief_pallas at KITTI res — so Pallas stays opt-in
        # (descriptor="brief_pallas").
        sml, smr = brief_mod.smooth(left), brief_mod.smooth(right)
        dl = brief_mod.describe_dense(sml, kl.xy, cfg.desc_bytes)
        dr = brief_mod.describe_dense(smr, kr.xy, cfg.desc_bytes)

    # backend="xla": inside this fused step the matrix formulation
    # overlaps with neighbouring stages; the pallas kernel is a fusion
    # barrier here (see match._use_pallas_match)
    m = match_mod.stereo_match_live(
        kl, dl, kr, dr, epi_threshold=cfg.epi_threshold,
        max_disparity=cfg.max_disparity, backend="xla",
        norm=cfg.desc_norm)

    xy_r = take_rows(kr.xy, m.train_idx)            # (N, 2) matched right kp
    X = rig.triangulate(kl.xy, xy_r)
    uv4 = jnp.concatenate([kl.xy, xy_r], -1)
    feats = FrameFeatures(kps=kl, bits=dl.bits, X=X,
                          stereo_valid=m.valid, uv4=uv4)
    stats = dict(n_detect_l=kl.count, n_detect_r=kr.count,
                 n_stereo=m.count)
    return feats, detl.thresholds, detr.thresholds, stats


def _estimate_motion(key, cur: FrameFeatures, prev: FrameFeatures,
                     rig: StereoRig, cfg: VOConfig):
    """Stages 6-7: inter-frame association + egomotion."""
    tm = match_mod.interframe_match(
        cur.kps, Descriptors(bits=cur.bits),
        prev.kps, Descriptors(bits=prev.bits),
        box=cfg.track_box, ratio=cfg.lowe_ratio, backend="xla",
        norm=cfg.desc_norm)
    # one fused gather for everything keyed by tm.train_idx: the one-hot
    # (N, N) factor is the expensive part of take_rows — build it once
    # for the concatenated [X | uv4 | stereo_valid] payload
    payload = jnp.concatenate(
        [prev.X, prev.uv4, prev.stereo_valid[:, None].astype(jnp.float32)],
        axis=-1)                                     # (N, 8)
    g = take_rows(payload, tm.train_idx)
    Xp, uvp = g[:, :3], g[:, 3:7]
    pair_valid = tm.valid & cur.stereo_valid & (g[:, 7] > 0.5)
    Xc = cur.X                                       # (N, 3) current frame

    if cfg.motion == "essential":
        res = essential_mod.essential_scaled_motion(
            key, uvp, cur.uv4, Xp, Xc, pair_valid, rig,
            n_hyps=cfg.ransac_hyps, threshold_px=1.0)
        H, inliers, n_inl = res.H, res.inliers, res.n_inliers
    else:
        res = ransac_mod.rigid_ransac(
            key, Xp, Xc, pair_valid, n_hyps=cfg.ransac_hyps,
            threshold=cfg.ransac_threshold)
        H, inliers, n_inl = res.H, res.inliers, res.n_inliers

    if cfg.lm_refine:
        ref = lm_mod.refine_motion(H, Xp, cur.uv4, inliers, rig,
                                   iters=cfg.lm_iters)
        H = ref.H

    ok = n_inl >= cfg.min_track_inliers
    H = jnp.where(ok, H, jnp.eye(4))
    return H, dict(n_tracks=jnp.sum(pair_valid), n_inliers=n_inl,
                   motion_ok=ok, track_xy_prev=uvp[:, :2],
                   track_valid=pair_valid, track_inliers=inliers)


@f32_precision
def vo_step(state: VOState, left, right, rig: StereoRig,
            cfg: VOConfig) -> tuple[VOState, VOFrameOutput]:
    """Process one rectified stereo pair.  Fully jittable."""
    left = jnp.asarray(left, jnp.float32)
    right = jnp.asarray(right, jnp.float32)
    key, sub = jax.random.split(state.key)

    cur, tl, tr, det_stats = _extract_frame(
        left, right, state.thresholds_l, state.thresholds_r, rig, cfg)

    H, mot_stats = _estimate_motion(sub, cur, state.prev, rig, cfg)
    # first frame has no predecessor: identity motion
    is_first = state.frame_idx == 0
    H = jnp.where(is_first, jnp.eye(4), H)

    # pose update: X_cam_cur = H · X_cam_prev  =>  world_T_cur = world_T_prev · H⁻¹
    pose = state.pose @ se3.invert_homog(H)

    new_state = VOState(thresholds_l=tl, thresholds_r=tr, prev=cur,
                        pose=pose, frame_idx=state.frame_idx + 1, key=key)
    out = VOFrameOutput(
        pose=pose, motion=H,
        n_detect_l=det_stats["n_detect_l"],
        n_detect_r=det_stats["n_detect_r"],
        n_stereo=det_stats["n_stereo"],
        n_tracks=mot_stats["n_tracks"],
        n_inliers=mot_stats["n_inliers"],
        motion_ok=mot_stats["motion_ok"] | is_first,
        track_xy_prev=mot_stats["track_xy_prev"],
        track_valid=mot_stats["track_valid"] & ~is_first,
        track_inliers=mot_stats["track_inliers"] & ~is_first)
    return new_state, out


def swap_descriptor(state: VOState,
                    new_cfg: VOConfig) -> VOState:
    """Mid-stream descriptor reconfig — the `setDetector` service
    (`/root/reference/src/StereoCamera.cpp:422-521`) as a state
    migration: the integrated pose, adaptive thresholds, frame index and
    PRNG carry over; the per-frame feature memory restarts at the new
    descriptor width (descriptor families are not comparable across the
    swap, so the first frame after it yields identity motion and
    tracking re-seeds — exactly the reference's behavior, which clears
    its match state on reconfig)."""
    n = new_cfg.grid.capacity
    d = new_cfg.desc_dim
    feats = FrameFeatures(
        kps=Keypoints.empty(n),
        bits=jnp.zeros((n, d), jnp.float32),
        X=jnp.zeros((n, 3), jnp.float32),
        stereo_valid=jnp.zeros((n,), bool),
        uv4=jnp.zeros((n, 4), jnp.float32))
    return state._replace(prev=feats)


def run_sequence(state: VOState, lefts, rights, rig: StereoRig,
                 cfg: VOConfig):
    """Scan the frame step over a (T, H, W) stacked sequence on-device."""
    def body(s, pair):
        l, r = pair
        return vo_step(s, l, r, rig, cfg)

    return jax.lax.scan(body, state, (jnp.asarray(lefts), jnp.asarray(rights)))
