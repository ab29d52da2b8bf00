"""Windowed-mode operating-point sweep: (fps, ATE) per (ba_every, iters).

The windowed pipeline refines continuously like the reference's
window_node (`/root/reference/bin/window_node:13-20` at 10 Hz); on TPU
the BA share of the frame budget is tunable by running it every k-th
frame and by the LM iteration count.  This sweep measures BOTH sides of
the trade on the same inputs:

- fps on the real chip at KITTI resolution (fetch-synchronized — see
  bench._sync);
- ATE on the rendered-world 6-DoF corridor (sim/render.py), where BA
  has real drift to correct, vs the plain frame-to-frame pipeline.

Prints a markdown table; `reports/r*/WINDOW_TRADEOFF.md` commits the
measured numbers backing the production default.
"""
from __future__ import annotations

import time

import numpy as np

from front_end_tpu.utils import cache as _cache

_cache.enable()


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_sequence, _sync
    from front_end_tpu.eval import metrics
    from front_end_tpu.geometry.camera import StereoRig, kitti_rig
    from front_end_tpu.ops import grid
    from front_end_tpu.pipeline import vo, window_vo
    from front_end_tpu.sim import render

    # ---- fps side: KITTI-res synthetic frames on the chip --------------
    rig = kitti_rig()
    cfg = vo.VOConfig(
        grid=grid.GridConfig(grid_rows=2, grid_cols=3, cell_capacity=384,
                             set_point=2000, init_threshold=15.0),
        desc_bytes=32, ransac_hyps=256, ransac_threshold=0.5,
        max_disparity=192.0, min_track_inliers=12)
    n_frames = 20
    lefts, rights = make_sequence(n_frames, h=rig.height, w=rig.width)
    L = [jax.device_put(jnp.asarray(x)) for x in lefts]
    R = [jax.device_put(jnp.asarray(x)) for x in rights]

    # ---- accuracy side: rendered 6-DoF corridor ------------------------
    rng = np.random.RandomState(11)
    rrig = StereoRig.create(fx=200.0, cx=127.5, cy=95.5, baseline=0.3,
                            width=256, height=192)
    scene = render.corridor_scene(rng, tex_size=384)
    gtT = render.corridor_trajectory(40)
    rl, rr = render.render_stereo_sequence(scene, rrig, gtT)
    rcfg = vo.VOConfig(
        grid=grid.GridConfig(grid_rows=2, grid_cols=3, cell_capacity=128,
                             set_point=700, init_threshold=12.0),
        desc_bytes=32, ransac_hyps=192, ransac_threshold=0.12,
        max_disparity=60.0, min_track_inliers=10)

    def run_windowed_ate(ba_every, iters, window=3):
        wc = window_vo.WindowVOConfig.create(rcfg, window=window,
                                             ba_every=ba_every,
                                             ba_iters=iters)
        s = window_vo.init_state(rrig, wc)
        stp = jax.jit(lambda s_, l, r: window_vo.window_vo_step(
            s_, l, r, rrig, wc))
        poses = []
        for t in range(rl.shape[0]):
            s, o = stp(s, jnp.asarray(rl[t]), jnp.asarray(rr[t]))
            poses.append(np.asarray(o.frame.pose))
        return metrics.ate_rmse(np.stack(poses)[:, :3, 3], gtT[:, :3, 3])

    def run_fps(ba_every, iters, reps=4, window=3):
        wc = window_vo.WindowVOConfig.create(cfg, window=window,
                                             ba_every=ba_every,
                                             ba_iters=iters)
        s0 = window_vo.init_state(rig, wc)
        stp = jax.jit(lambda s_, l, r: window_vo.window_vo_step(
            s_, l, r, rig, wc))
        s = s0
        for t in range(3):
            s, o = stp(s, L[t], R[t])
        _sync(o.frame.pose)
        t0 = time.perf_counter()
        for _ in range(reps):
            for t in range(n_frames):
                s, o = stp(s, L[t], R[t])
        _sync(o.frame.pose)
        return reps * n_frames / (time.perf_counter() - t0)

    # plain frame-to-frame baseline ATE
    s = vo.init_state(rrig, rcfg)
    stp = jax.jit(lambda s_, l, r: vo.vo_step(s_, l, r, rrig, rcfg))
    poses = []
    for t in range(rl.shape[0]):
        s, o = stp(s, jnp.asarray(rl[t]), jnp.asarray(rr[t]))
        poses.append(np.asarray(o.pose))
    ate_plain = metrics.ate_rmse(np.stack(poses)[:, :3, 3], gtT[:, :3, 3])

    rows = ["| mode | ba_every | iters | fps/chip | ATE (m) |",
            "|---|---|---|---|---|",
            f"| frame-to-frame | — | — | (see bench headline) | "
            f"{ate_plain:.4f} |"]
    for ba_every in (1, 2, 4):
        for iters in (2, 4):
            fps = run_fps(ba_every, iters)
            ate = run_windowed_ate(ba_every, iters)
            rows.append(f"| windowed | {ba_every} | {iters} | {fps:.1f} | "
                        f"{ate:.4f} |")
            print(f"  measured: {rows[-1]}", flush=True)
    print("\n".join(rows))

    # ---- window-length operating curve (VERDICT r5 #9) -----------------
    # The reference hard-codes W=3 (front_end_window_node.cpp:6); here W
    # is a config, and this measures what longer windows actually buy at
    # the production operating point (ba_every=2, iters=2): fps cost
    # (the BA stage is O(W^2) in both compute blocks and the distributed
    # solver's per-iteration communication, ba/distributed.comm_audit)
    # vs rendered-world ATE.
    from front_end_tpu.ba import distributed as dist_mod
    rows2 = ["", "| window W | fps/chip | ATE (m) | comm/iter (B) |",
             "|---|---|---|---|"]
    for Wn in (3, 4, 6, 8):
        fps = run_fps(2, 2, window=Wn)
        ate = run_windowed_ate(2, 2, window=Wn)
        cb = dist_mod.comm_audit(Wn, 1)["bytes_per_iter"]
        rows2.append(f"| {Wn} | {fps:.1f} | {ate:.4f} | {cb} |")
        print(f"  measured: {rows2[-1]}", flush=True)
    print("\n".join(rows2))


if __name__ == "__main__":
    main()
