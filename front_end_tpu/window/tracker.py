"""Sliding-window landmark tracker — the map state of the front end.

Replaces the reference's graph machinery with static-shape arrays:
- `bumblebee.baseTypes.slidingGraph` (networkx pose/landmark graph used by
  `liveGraph`, `/root/reference/src/front_end/algorithm.py:1113-1251`):
  `newPoseVertex`, `newLandmarkVertex`, `getLandmarksVisibleAT`,
  `getDescriptors`, stereo-edge creation;
- `WindowMatcher`'s 3-frame window with eviction
  (`src/WindowMatcher.cpp:92-96,326-330`).

Design: a FIXED-CAPACITY landmark store (capacity M) where every row is a
landmark slot carrying its world position, its current binary descriptor,
its last-seen frame index and a per-window-slot measurement history
(W, 4) + visibility.  Track association is one MXU Hamming match of the
current frame's descriptors against the store (ROI-gated); unmatched
stereo features claim recycled slots (oldest-first) — the static-shape
equivalent of `newLandmarkVertex`.  The window is a shift register over
the W measurement slots, exactly the reference's evict-oldest semantics.

Everything is a pytree carried through `lax.scan`; the windowed BA
(`front_end_tpu.ba`) consumes the store's (M, W, 4) measurement block
directly — no graph extraction step.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from front_end_tpu.geometry import se3
from front_end_tpu.geometry.camera import StereoRig
from front_end_tpu.ops import match as match_mod
from front_end_tpu.types import Descriptors, Keypoints
from front_end_tpu.utils.precision import f32_precision


@struct.dataclass
class TrackerConfig:
    capacity: int = struct.field(pytree_node=False, default=4096)  # M slots
    window: int = struct.field(pytree_node=False, default=3)       # W frames
    desc_bits: int = struct.field(pytree_node=False, default=256)
    roi_box: float = struct.field(pytree_node=False, default=100.0)
    lowe_ratio: float = struct.field(pytree_node=False, default=0.8)
    max_age: int = struct.field(pytree_node=False, default=3)      # frames
    norm: str = struct.field(pytree_node=False, default="hamming")


class LandmarkStore(NamedTuple):
    Xw: jnp.ndarray          # (M, 3) world-frame position
    bits: jnp.ndarray        # (M, D) current descriptor {0,1}
    xy: jnp.ndarray          # (M, 2) last observed left-image position
    last_seen: jnp.ndarray   # (M,) int32 frame index, -1 = free
    valid: jnp.ndarray       # (M,) bool
    meas: jnp.ndarray        # (M, W, 4) [ul,vl,ur,vr] measurement window
    vis: jnp.ndarray         # (M, W) bool — observed in window slot w
    track_len: jnp.ndarray   # (M,) int32 — consecutive observations


class WindowState(NamedTuple):
    store: LandmarkStore
    poses: jnp.ndarray       # (W, 4, 4) camera_from_world for window slots
    pose_valid: jnp.ndarray  # (W,) bool
    frame_idx: jnp.ndarray   # () int32


class TrackUpdate(NamedTuple):
    state: WindowState
    matches: jnp.ndarray     # (N,) int32 store slot per current feature (-1)
    n_tracked: jnp.ndarray
    n_new: jnp.ndarray


def init_state(cfg: TrackerConfig) -> WindowState:
    M, W, D = cfg.capacity, cfg.window, cfg.desc_bits
    store = LandmarkStore(
        Xw=jnp.zeros((M, 3), jnp.float32),
        bits=jnp.zeros((M, D), jnp.float32),
        xy=jnp.full((M, 2), -1e6, jnp.float32),
        last_seen=jnp.full((M,), -1, jnp.int32),
        valid=jnp.zeros((M,), bool),
        meas=jnp.zeros((M, W, 4), jnp.float32),
        vis=jnp.zeros((M, W), bool),
        track_len=jnp.zeros((M,), jnp.int32))
    return WindowState(store=store,
                       poses=jnp.broadcast_to(jnp.eye(4), (W, 4, 4)),
                       pose_valid=jnp.zeros((W,), bool),
                       frame_idx=jnp.int32(0))


def _advance_window(store: LandmarkStore, poses, pose_valid):
    """Shift the measurement window left by one (evict slot 0 — the
    reference's `window.erase(begin())`, WindowMatcher.cpp:92-96)."""
    meas = jnp.roll(store.meas, -1, axis=1).at[:, -1].set(0.0)
    vis = jnp.roll(store.vis, -1, axis=1).at[:, -1].set(False)
    poses = jnp.roll(poses, -1, axis=0).at[-1].set(jnp.eye(4))
    pose_valid = jnp.roll(pose_valid, -1, axis=0).at[-1].set(False)
    return store._replace(meas=meas, vis=vis), poses, pose_valid


@f32_precision
def update(state: WindowState, kps: Keypoints, desc: Descriptors,
           X_cam, stereo_valid, uv4, pose_cur, cfg: TrackerConfig,
           rig: StereoRig) -> TrackUpdate:
    """Ingest one frame's stereo features.

    kps/desc/X_cam/stereo_valid/uv4: the frame's left features, stereo
    triangulations (camera frame) and stereo measurements (capacity N).
    pose_cur: (4,4) camera_from_world extrinsic of this frame.
    """
    store = state.store
    M = cfg.capacity
    N = kps.capacity
    fidx = state.frame_idx

    store, poses, pose_valid = _advance_window(
        store, state.poses, state.pose_valid)
    poses = poses.at[-1].set(pose_cur)
    pose_valid = pose_valid.at[-1].set(True)

    # ---- track association (liveGraph.updateMatches semantics) --------
    recently = store.valid & (fidx - store.last_seen <= cfg.max_age)
    lm_kps = Keypoints(xy=store.xy, score=jnp.zeros((M,)),
                       angle=jnp.zeros((M,)), valid=recently)
    cur_valid = kps.valid & stereo_valid
    cur_kps = kps.replace(valid=cur_valid)
    m = match_mod.interframe_match(
        cur_kps, desc, lm_kps, Descriptors(bits=store.bits),
        box=cfg.roi_box, ratio=cfg.lowe_ratio, backend="xla",
        norm=cfg.norm)
    tracked = m.valid & cur_valid                      # (N,)
    slot_of_feature = jnp.where(tracked, m.train_idx, -1)

    # ---- write tracked observations ----------------------------------
    # Scatters serialize on TPU (~0.9 ms each; this block had 14 of
    # them).  Instead each write is a one-hot MXU matmul: slot m's row is
    # ohᵀ·val where oh[n, m] = (slot_of_feature n == m) — exact, since
    # every slot is claimed by at most one feature (post-dedup matches /
    # distinct allocation ranks).
    Xw_cur = se3.transform_points(se3.invert_homog(pose_cur), X_cam)
    tslot = jnp.where(tracked, m.train_idx, M)         # M = discard

    def dense_writes(slot):
        oh = (slot[:, None] == jnp.arange(M)[None, :])   # (N, M)
        ohf = oh.astype(jnp.float32)
        hit = jnp.any(oh, axis=0)                        # (M,)

        def put(dst, val):
            """dst (M, D) <- val rows at the hit slots (one-hot matmul);
            exact: each slot is claimed by at most one feature.
            Precision.HIGHEST keeps f32 payloads (pixel coords, world
            points) from rounding through bf16 regardless of the
            caller's matmul-precision context."""
            vm = jax.lax.dot_general(
                ohf, jnp.asarray(val, jnp.float32),
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32).astype(dst.dtype)
            return jnp.where(hit[:, None], vm, dst)
        return hit, put

    hit_t, put_t = dense_writes(tslot)
    store = store._replace(
        bits=put_t(store.bits, desc.bits),
        xy=put_t(store.xy, kps.xy),
        last_seen=jnp.where(hit_t, fidx, store.last_seen),
        meas=store.meas.at[:, -1].set(put_t(store.meas[:, -1], uv4)),
        vis=store.vis.at[:, -1].set(store.vis[:, -1] | hit_t),
        track_len=store.track_len + hit_t.astype(jnp.int32))

    # ---- allocate new landmarks (newLandmarkVertex) -------------------
    from front_end_tpu.ops.dense_select import lookup, segment_min

    is_new = cur_valid & ~tracked
    # free slots: never-used (dead) or expired (valid but unseen for
    # > max_age).  Recycling is TWO-TIER: all dead slots are claimed
    # before ANY expired one — expired slots still hold landmarks that
    # `interframe_match` can re-acquire after a brief occlusion, so they
    # are evicted last.  Within each tier the order is INDEX order via a
    # cumsum ranking inverted by one dense compare; the previous global
    # oldest-first policy needed a full argsort over the M slots
    # (~0.8 ms at M=4608, the hottest op in the tracker) and within the
    # dead tier order is policy-free.  Accepted deviation: among EXPIRED
    # slots a just-expired track can be recycled before a much older one
    # — reachable only once every dead slot is exhausted.  Never
    # overwrite live landmarks: allocation stops at the free-slot count.
    dead = ~store.valid
    expired = store.valid & (fidx - store.last_seen > cfg.max_age)
    stale = dead | expired
    rank_dead = jnp.cumsum(dead.astype(jnp.int32)) - 1    # (M,)
    rank_exp = jnp.sum(dead) + jnp.cumsum(expired.astype(jnp.int32)) - 1
    rank_slot = jnp.where(dead, rank_dead, rank_exp)      # (M,)
    n_free = jnp.sum(stale)
    rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1       # (N,)
    can_alloc = is_new & (rank < n_free)
    slot_for_rank = segment_min(
        jnp.arange(M), jnp.where(stale, rank_slot, N), N, fill=M - 1)
    slot_new = lookup(slot_for_rank, jnp.clip(rank, 0, N - 1))
    nslot = jnp.where(can_alloc, slot_new, M)

    hit_n, put_n = dense_writes(nslot)
    # claimed slots restart: measurement window zeroed except the last
    # slot (this frame's uv4), vis only the last slot
    meas = jnp.where(hit_n[:, None, None],
                     jnp.zeros_like(store.meas), store.meas)
    meas = meas.at[:, -1].set(put_n(meas[:, -1], uv4))
    vis = jnp.where(hit_n[:, None], False, store.vis)
    vis = vis.at[:, -1].set(vis[:, -1] | hit_n)
    store = store._replace(
        Xw=put_n(store.Xw, Xw_cur),
        bits=put_n(store.bits, desc.bits),
        xy=put_n(store.xy, kps.xy),
        last_seen=jnp.where(hit_n, fidx, store.last_seen),
        valid=store.valid | hit_n,
        meas=meas,
        vis=vis,
        track_len=jnp.where(hit_n, 1, store.track_len))

    slot_of_feature = jnp.where(can_alloc, slot_new, slot_of_feature)

    new_state = WindowState(store=store, poses=poses,
                            pose_valid=pose_valid, frame_idx=fidx + 1)
    return TrackUpdate(state=new_state,
                       matches=slot_of_feature.astype(jnp.int32),
                       n_tracked=jnp.sum(tracked),
                       n_new=jnp.sum(can_alloc))


def tracked_pairs(state_prev: WindowState, upd: TrackUpdate, X_cam_cur):
    """(Xa_prev_world->prevcam?, ...) helper retained for VO: returns the
    3D-3D correspondence arrays between the previous frame's landmark
    positions and the current frame's camera-frame triangulations, for
    the rigid RANSAC (svdRANSAC capability)."""
    slot = jnp.maximum(upd.matches, 0)
    Xw_prev = state_prev.store.Xw[slot]
    valid = upd.matches >= 0
    return Xw_prev, X_cam_cur, valid


def run_window_ba(state: WindowState, rig: StereoRig, *, iters: int = 8,
                  huber_px: float = 3.0, min_obs: int = 2,
                  outlier_gate_px: float = 8.0,
                  max_landmarks: int | None = 1024,
                  mesh=None):
    """Windowed BA over the store: optimize the W window poses (+ the
    landmarks observed >= min_obs times in-window).  Returns the updated
    state.  This is the `sba_node` capability wired to live tracking.

    `outlier_gate_px`: observations whose reprojection residual at the
    initial state exceeds this are dropped before optimizing — the BA
    counterpart of the RANSAC gating the frame-to-frame path gets
    (descriptor mis-associations land tens of px off; Huber alone still
    lets their saturated influence bias the window poses).

    `max_landmarks`: the solver runs on a COMPACTED problem — the top-K
    usable landmarks by in-window observation count (ties: longest
    track).  The store's M slots are mostly empty or under-observed;
    solving the dense (M, W) grid wasted ~2x compute at production
    capacities.  Gather/scatter ride one-hot MXU matmuls (dense_select),
    so the compaction itself costs tens of microseconds.  None = solve
    the full grid.

    `mesh`: a `jax.sharding.Mesh` with a 'landmark' axis — the solve
    then runs LANDMARK-SHARDED over the mesh with the psum-reduced
    camera system (`ba/distributed.py`), so the LIVE windowed pipeline
    distributes its BA across chips the way the reference distributed
    its whole system across ROS nodes (SURVEY §5).  Requires
    `max_landmarks` divisible by the mesh's landmark-axis size (the
    compacted block is the sharded dimension).
    """
    from front_end_tpu.ba import factors, schur
    from front_end_tpu.ops.dense_select import compact_rows, topk_onehot

    store = state.store
    obs_count = jnp.sum(store.vis, axis=1)
    use = store.valid & (obs_count >= min_obs)
    vis = store.vis & use[:, None] & state.pose_valid[None, :]
    if outlier_gate_px is not None:
        r = factors.residual(state.poses[None, :], store.Xw[:, None, :],
                             store.meas, rig)
        vis = vis & (jnp.sum(r * r, -1) < outlier_gate_px ** 2)

    M = store.Xw.shape[0]
    if mesh is not None and (max_landmarks is None or max_landmarks >= M):
        raise ValueError(
            "sharded window BA runs on the compacted problem: set "
            f"max_landmarks < store capacity {M} (and divisible by the "
            "mesh's landmark axis)")
    if max_landmarks is not None and max_landmarks < M:
        K = max_landmarks
        # top-K selection WITHOUT sorting: the score is integer-valued
        # (+1 keeps valid scores >= 1, a topk_onehot precondition), so
        # the K-th-largest threshold bisects exactly and ONE (M, K)
        # one-hot serves every gather and the scatter-back.  Standalone,
        # lax.top_k costs 0.85 ms at M=4608 and the per-array one-hot
        # gathers another 0.89; in-context the fused run_window_ba
        # measures the same either way (~2.1 ms — XLA overlaps the
        # selection with the solve), so this buys exactness-preserving
        # uniformity with the "selection without sorting" rule, not fps.
        score = jnp.where(use, obs_count.astype(jnp.float32) * 1e4
                          + jnp.minimum(store.track_len, 9999) + 1.0, 0.0)
        smax = store.meas.shape[1] * 10000 + 10000
        oh, sel_mask, n_sel = topk_onehot(score, K, smax)  # (M, K)
        sel_valid = jnp.arange(K) < n_sel
        Xk = compact_rows(oh, store.Xw)
        meask = compact_rows(oh, store.meas.reshape(M, -1)).reshape(
            K, *store.meas.shape[1:])
        visk = compact_rows(oh, vis) & sel_valid[:, None]
        if mesh is not None:
            from front_end_tpu.ba import distributed
            n_lm = mesh.shape[distributed.AXIS]
            if K % n_lm:
                raise ValueError(
                    f"max_landmarks={K} not divisible by landmark axis "
                    f"size {n_lm}")
            res = distributed.ba_solve_sharded_inline(
                mesh, state.poses, Xk, meask,
                visk.astype(jnp.float32), rig,
                iters=iters, huber_px=huber_px)
        else:
            res = schur.ba_solve(state.poses, Xk, meask, visk, rig,
                                 iters=iters, huber_px=huber_px)
        # scatter refined landmarks back through the SAME one-hot (each
        # slot selected at most once -> the transpose matmul is exact)
        upd = jax.lax.dot_general(
            oh, res.landmarks,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)           # (M, 3)
        new_store = store._replace(
            Xw=jnp.where(sel_mask[:, None], upd, store.Xw))
        return state._replace(store=new_store, poses=res.poses), res

    res = schur.ba_solve(state.poses, store.Xw, store.meas, vis, rig,
                        iters=iters, huber_px=huber_px)
    new_store = store._replace(
        Xw=jnp.where(use[:, None], res.landmarks, store.Xw))
    return state._replace(store=new_store, poses=res.poses), res
