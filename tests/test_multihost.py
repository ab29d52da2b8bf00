"""2-process `jax.distributed` smoke: the DCN path actually runs.

`initialize_multihost` (`ba/distributed.py`) promises the landmark mesh
can span hosts with the reduced-camera-system psum riding DCN.  This
test launches two REAL processes (localhost coordinator, one CPU device
each), runs `ba_solve_sharded` over the 2-process global mesh, and
asserts the result matches the single-process solver — the TPU-native
replacement for the reference's ROS graph as its distribution backend
(SURVEY §5).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_ba(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    out = str(tmp_path / "proc0_result.npz")
    workers = []
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    # one device per process: drop any forced host device count
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    script = os.path.join(os.path.dirname(__file__),
                          "_multihost_worker.py")
    for pid in range(2):
        workers.append(subprocess.Popen(
            [sys.executable, script, coord, "2", str(pid), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=repo_root))
    logs = []
    for w in workers:
        stdout, _ = w.communicate(timeout=600)
        logs.append(stdout.decode())
    for w, log in zip(workers, logs):
        assert w.returncode == 0, f"worker failed:\n{log}"
    assert os.path.exists(out), logs

    z = np.load(out)
    assert np.isfinite(z["cost"]) and z["cost"] < z["cost0"]

    # single-process reference on the identical problem
    import jax
    from front_end_tpu.ba import distributed
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

    mesh1 = distributed.make_mesh(1)
    ref = distributed.ba_solve_sharded(mesh1, T0, X0, meas,
                                       vis.astype(np.float32), rig,
                                       iters=6, huber_px=2.0)
    assert np.allclose(z["poses"], np.array(ref.poses), atol=2e-2), (
        np.abs(z["poses"] - np.array(ref.poses)).max())

    # ---- live windowed pipeline ran 2-process: parity vs 1-process ----
    # The workers drove real window_vo steps with the in-step BA psums
    # crossing the process boundary; the trajectory must match the
    # SAME pipeline run single-process with an unsharded BA.
    assert z["ba_ran"].any(), z["ba_ran"]
    import jax.numpy as jnp
    from __graft_entry__ import _make_sequence
    from front_end_tpu.geometry.camera import StereoRig as SR
    from front_end_tpu.ops import grid as grid_mod
    from front_end_tpu.pipeline import vo as vo_mod
    from front_end_tpu.pipeline import window_vo

    h, w = 96, 160
    vrig = SR.create(fx=80.0, cx=(w - 1) / 2, cy=(h - 1) / 2,
                     baseline=0.5, width=w, height=h)
    vcfg = vo_mod.VOConfig(
        grid=grid_mod.GridConfig(cell_capacity=32, set_point=150,
                                 init_threshold=10.0),
        desc_bytes=16, ransac_hyps=32, ransac_threshold=0.2,
        max_disparity=20.0, min_track_inliers=4)
    wcfg = window_vo.WindowVOConfig.create(
        vcfg, window=3, ba_every=1, ba_iters=3, capacity=256,
        ba_max_landmarks=128)
    lefts, rights = _make_sequence(4, h, w)
    state = window_vo.init_state(vrig, wcfg)
    step = jax.jit(lambda s, l, r: window_vo.window_vo_step(
        s, l, r, vrig, wcfg))
    ref_traj = []
    for t in range(4):
        state, outw = step(state, jnp.asarray(lefts[t]),
                           jnp.asarray(rights[t]))
        ref_traj.append(np.asarray(outw.frame.pose))
    ref_traj = np.stack(ref_traj)
    assert np.allclose(z["traj"], ref_traj, atol=5e-3), (
        np.abs(z["traj"] - ref_traj).max())
