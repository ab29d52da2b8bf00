"""Trajectory evaluation: ATE / RPE and scaling-efficiency reports.

The reference evaluated estimators by absolute per-motion error against
synthetic ground truth (`compareAbsoluteMotion`, `~motion.py:120-131`)
and by eyeballing plots.  For sequence-level evaluation (KITTI/EuRoC,
BASELINE.json configs) this module provides the standard metrics:

- ATE: RMS translational error after optional SE(3)/Sim(3) alignment
  (Umeyama via the framework's weighted Kabsch);
- RPE: relative pose error over a fixed frame delta (KITTI-style);
- scaling efficiency: throughput(N devices) / (N · throughput(1)).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from front_end_tpu.geometry import se3
from front_end_tpu.motion import kabsch


def align_trajectories(est_t, gt_t, with_scale: bool = False):
    """Umeyama alignment of (T,3) estimated positions onto ground truth.

    Returns (aligned_est, H, scale)."""
    est_t = jnp.asarray(est_t)
    gt_t = jnp.asarray(gt_t)
    s = 1.0
    if with_scale:
        ce = jnp.mean(est_t, 0)
        cg = jnp.mean(gt_t, 0)
        s = (jnp.sum(jnp.linalg.norm(gt_t - cg, axis=-1))
             / jnp.maximum(jnp.sum(jnp.linalg.norm(est_t - ce, axis=-1)),
                           1e-12))
    H = kabsch.rigid_transform_3d(est_t * s, gt_t)
    aligned = se3.transform_points(H, est_t * s)
    return aligned, H, s


def ate_rmse(est_t, gt_t, align: bool = True, with_scale: bool = False):
    """Absolute trajectory error (RMSE of positions, metres)."""
    est_t = jnp.asarray(est_t)
    gt_t = jnp.asarray(gt_t)
    if align:
        est_t, _, _ = align_trajectories(est_t, gt_t, with_scale)
    err = jnp.linalg.norm(est_t - gt_t, axis=-1)
    return float(jnp.sqrt(jnp.mean(err**2)))


def rpe(est_poses, gt_poses, delta: int = 1):
    """Relative pose error over frame pairs (i, i+delta).

    est_poses/gt_poses: (T,4,4) world_T_camera.  Returns dict with
    translational RMSE (m) and rotational RMSE (deg).
    """
    est = jnp.asarray(est_poses)
    gt = jnp.asarray(gt_poses)
    de = se3.invert_homog(est[:-delta]) @ est[delta:]
    dg = se3.invert_homog(gt[:-delta]) @ gt[delta:]
    rel = se3.invert_homog(dg) @ de
    t_err = jnp.linalg.norm(rel[:, :3, 3], axis=-1)
    r_err = se3.rotation_geodesic_error(
        jnp.broadcast_to(jnp.eye(3), rel[:, :3, :3].shape), rel[:, :3, :3])
    return {"trans_rmse_m": float(jnp.sqrt(jnp.mean(t_err**2))),
            "rot_rmse_deg": float(jnp.degrees(
                jnp.sqrt(jnp.mean(r_err**2))))}


def poses_from_motions(motions):
    """Integrate (T,4,4) per-frame extrinsic maps prev->cur into
    world_T_camera poses (pose 0 = identity)."""
    motions = np.asarray(motions)
    poses = [np.eye(4)]
    for H in motions:
        poses.append(poses[-1] @ np.array(se3.invert_homog(jnp.asarray(H))))
    return np.stack(poses)


def scaling_efficiency(throughputs: dict[int, float]) -> dict[int, float]:
    """{n_devices: items/s} -> {n_devices: efficiency}, eff(1)=1."""
    base = throughputs[min(throughputs)]
    nmin = min(throughputs)
    return {n: (v / (base * n / nmin)) for n, v in throughputs.items()}
