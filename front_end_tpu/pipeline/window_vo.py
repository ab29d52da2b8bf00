"""Live windowed VO: frame step + sliding-window tracking + windowed BA.

This is the TPU rebuild of the reference's full window pipeline: what
`bin/window_node` drives at 10 Hz (`/root/reference/bin/window_node:13-20`
looping `liveGraph.updateMatches`, `src/front_end/algorithm.py:1132-1236`)
and what `WindowMatcher::newStereo` does per frame in C++
(`src/WindowMatcher.cpp:75-336`: triangulate → window push/evict → track
→ motion), with the windowed bundle adjustment the reference *intended*
(`sba_node`, build-disabled, `src/sba_node.cpp:84-266`) actually wired
into the hot loop.

Per frame (all inside ONE jit-compiled step):
  1. the plain VO frame step (detect/describe/match/triangulate/motion);
  2. `window.tracker.update` — landmark store association + allocation;
  3. every `ba_every` frames a `lax.cond` runs the Schur-complement LM
     windowed BA over the W in-window poses + tracked landmarks and the
     REFINED pose replaces the integrated one (the carried VO state
     adopts it, so subsequent frames integrate on top of the BA result).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from front_end_tpu.geometry import se3
from front_end_tpu.geometry.camera import StereoRig
from front_end_tpu.pipeline import vo as vo_mod
from front_end_tpu.types import Descriptors
from front_end_tpu.utils.precision import f32_precision
from front_end_tpu.window import tracker as tracker_mod


@struct.dataclass
class WindowVOConfig:
    vo: vo_mod.VOConfig = struct.field(
        pytree_node=False, default_factory=vo_mod.VOConfig)
    tracker: tracker_mod.TrackerConfig = struct.field(
        pytree_node=False, default_factory=tracker_mod.TrackerConfig)
    ba_every: int = struct.field(pytree_node=False, default=1)
    ba_iters: int = struct.field(pytree_node=False, default=6)
    huber_px: float = struct.field(pytree_node=False, default=3.0)
    min_obs: int = struct.field(pytree_node=False, default=2)
    # a jax.sharding.Mesh with a 'landmark' axis: the per-window BA then
    # runs landmark-sharded across the mesh INSIDE the jitted frame step
    # (psum-reduced camera system, ba/distributed.py) — the live
    # pipeline's multi-chip mode.  None = single-device BA.
    ba_mesh: object = struct.field(pytree_node=False, default=None)
    # compacted-problem size handed to the BA (must divide by the mesh's
    # landmark axis when ba_mesh is set).  1024 is the measured knee
    # (r5, real chip at KITTI res, ba_every=2 iters=2: K=2048 -> 209
    # fps, K=1024 -> 230, K=512 -> 241, rendered-world ATE identical
    # 0.0274 at every K); it also matches the reference's own window
    # scale (set-point 1000 features/frame, live_stereo.cpp:135).
    ba_max_landmarks: int = struct.field(pytree_node=False, default=1024)

    @staticmethod
    def create(vo_cfg: vo_mod.VOConfig, *, window: int = 3,
               capacity: int | None = None, **kw) -> "WindowVOConfig":
        """Tracker capacity defaults to the detector capacity; descriptor
        width always follows the VO config."""
        tr = tracker_mod.TrackerConfig(
            capacity=capacity or 2 * vo_cfg.grid.capacity,
            window=window,
            desc_bits=vo_cfg.desc_dim,
            roi_box=vo_cfg.track_box,
            lowe_ratio=vo_cfg.lowe_ratio,
            norm=vo_cfg.desc_norm)
        return WindowVOConfig(vo=vo_cfg, tracker=tr, **kw)


class WindowVOState(NamedTuple):
    vo: vo_mod.VOState
    win: tracker_mod.WindowState


class WindowVOOutput(NamedTuple):
    frame: vo_mod.VOFrameOutput   # frame-to-frame outputs (pose = BA-refined)
    pose_raw: jnp.ndarray         # (4,4) pose before BA this frame
    n_tracked: jnp.ndarray        # landmark-store associations
    n_new: jnp.ndarray            # newly allocated landmarks
    ba_ran: jnp.ndarray           # bool
    ba_cost: jnp.ndarray          # robust cost after BA (0 when not run)
    ba_rms_px: jnp.ndarray        # masked RMS reprojection error (px)


def init_state(rig: StereoRig, cfg: WindowVOConfig,
               seed: int = 0) -> WindowVOState:
    return WindowVOState(vo=vo_mod.init_state(rig, cfg.vo, seed),
                         win=tracker_mod.init_state(cfg.tracker))


@f32_precision
def window_vo_step(state: WindowVOState, left, right, rig: StereoRig,
                   cfg: WindowVOConfig):
    """One windowed-VO frame.  Fully jittable; BA under `lax.cond`."""
    new_vo, out = vo_mod.vo_step(state.vo, left, right, rig, cfg.vo)
    cur = new_vo.prev                       # this frame's features
    pose_cw = se3.invert_homog(new_vo.pose)  # camera_from_world

    upd = tracker_mod.update(
        state.win, cur.kps, Descriptors(bits=cur.bits), cur.X,
        cur.stereo_valid, cur.uv4, pose_cw, cfg.tracker, rig)
    win = upd.state

    W = cfg.tracker.window
    # BA needs a full window of poses and runs every ba_every frames
    # (the reference's window_node refines continuously at 10 Hz).
    fidx = win.frame_idx                     # frames ingested so far
    do_ba = (jnp.sum(win.pose_valid) >= W) & (
        (fidx % cfg.ba_every) == 0)

    def run_ba(w):
        w2, res = tracker_mod.run_window_ba(
            w, rig, iters=cfg.ba_iters, huber_px=cfg.huber_px,
            min_obs=cfg.min_obs, max_landmarks=cfg.ba_max_landmarks,
            mesh=cfg.ba_mesh)
        return w2, res.poses[-1], res.cost, res.rms_px, jnp.bool_(True)

    def skip_ba(w):
        return (w, pose_cw, jnp.float32(0.0), jnp.float32(0.0),
                jnp.bool_(False))

    win, pose_cw_ref, ba_cost, ba_rms, ba_ran = jax.lax.cond(
        do_ba, run_ba, skip_ba, win)

    pose_ref = se3.invert_homog(pose_cw_ref)     # world_T_camera, refined
    # the carried VO state adopts the refined pose so the next frame's
    # integration starts from the BA result
    new_vo = new_vo._replace(pose=pose_ref)
    out = out._replace(pose=pose_ref)

    return (WindowVOState(vo=new_vo, win=win),
            WindowVOOutput(frame=out, pose_raw=se3.invert_homog(pose_cw),
                           n_tracked=upd.n_tracked, n_new=upd.n_new,
                           ba_ran=ba_ran, ba_cost=ba_cost,
                           ba_rms_px=ba_rms))


def run_sequence(state: WindowVOState, lefts, rights, rig: StereoRig,
                 cfg: WindowVOConfig):
    """Scan the windowed frame step over a stacked (T, H, W) sequence."""
    def body(s, pair):
        l, r = pair
        return window_vo_step(s, l, r, rig, cfg)

    return jax.lax.scan(body, state,
                        (jnp.asarray(lefts), jnp.asarray(rights)))
