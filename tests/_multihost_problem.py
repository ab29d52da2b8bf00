"""The ONE definition of the 2-process smoke-test problems.

`_multihost_worker.py` (run as real subprocesses) and
`test_multihost.py` (the in-process single-device reference) must solve
the IDENTICAL problem for their parity assertions to mean
"distribution is correct" — so the rig/config/sequence constants live
here, imported by both, instead of being maintained as two copies that
could drift into a mysterious cross-process parity failure.

Importable both as a plain sibling module (the worker script runs with
`tests/` as sys.path[0]) and from pytest (rootdir insertion).
"""
import numpy as np


def make_ba_problem():
    """(rig, T0, T_gt, X0, meas, vis) — the W=3, L=512 synthetic BA
    problem with 0.5 px noise and perturbed initial poses (seed 0)."""
    from front_end_tpu.geometry.camera import StereoRig

    rig = StereoRig.create(fx=80.0, cx=79.5, cy=47.5, baseline=0.5,
                           width=160, height=96)
    W, L = 3, 512
    rs = np.random.RandomState(0)
    X0 = np.concatenate([rs.uniform(-4, 4, (L, 1)),
                         rs.uniform(-2, 2, (L, 1)),
                         rs.uniform(3, 10, (L, 1))], 1).astype(np.float32)
    T = np.stack([np.eye(4, dtype=np.float32) for _ in range(W)])
    for i in range(W):
        T[i, 0, 3] = -0.1 * i
    Xc = np.einsum("wij,lj->wli", T[:, :3, :3], X0) + T[:, None, :3, 3]
    fx, cx, cy, B = 80.0, 79.5, 47.5, 0.5
    ul = fx * Xc[..., 0] / Xc[..., 2] + cx
    vl = fx * Xc[..., 1] / Xc[..., 2] + cy
    ur = fx * (Xc[..., 0] - B) / Xc[..., 2] + cx
    meas = np.stack([ul, vl, ur, vl], -1).swapaxes(0, 1).astype(np.float32)
    vis = np.ones((L, W), bool)
    meas = meas + 0.5 * rs.normal(size=meas.shape).astype(np.float32)
    T0 = T.copy()
    T0[1:, :3, 3] += 0.01 * rs.normal(size=(W - 1, 3)).astype(np.float32)
    return rig, T0, T, X0, meas, vis


BA_ITERS = 6
BA_HUBER_PX = 2.0

LIVE_FRAMES = 4


def make_live_setup(ba_mesh=None):
    """(rig, window config, lefts, rights) for the live windowed
    4-frame run — tiny 96x160 world, W=3 BA every frame, K=128
    compaction.  `ba_mesh` shards the in-step BA (the worker passes the
    2-process mesh; the reference run passes None)."""
    from __graft_entry__ import _make_sequence
    from front_end_tpu.geometry.camera import StereoRig
    from front_end_tpu.ops import grid
    from front_end_tpu.pipeline import vo, window_vo

    h, w = 96, 160
    vrig = StereoRig.create(fx=80.0, cx=(w - 1) / 2, cy=(h - 1) / 2,
                            baseline=0.5, width=w, height=h)
    vcfg = vo.VOConfig(
        grid=grid.GridConfig(cell_capacity=32, set_point=150,
                             init_threshold=10.0),
        desc_bytes=16, ransac_hyps=32, ransac_threshold=0.2,
        max_disparity=20.0, min_track_inliers=4)
    wcfg = window_vo.WindowVOConfig.create(
        vcfg, window=3, ba_every=1, ba_iters=3, capacity=256,
        ba_max_landmarks=128, ba_mesh=ba_mesh)
    lefts, rights = _make_sequence(LIVE_FRAMES, h, w)
    return vrig, wcfg, lefts, rights
