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

    # single-process reference on the identical problem (shared builder
    # `_multihost_problem.py` — one definition, so the parity assertion
    # cannot silently compare two drifted configs)
    import jax

    import _multihost_problem as prob
    from front_end_tpu.ba import distributed

    rig, T0, _T_gt, X0, meas, vis = prob.make_ba_problem()

    mesh1 = distributed.make_mesh(1)
    ref = distributed.ba_solve_sharded(
        mesh1, T0, X0, meas, vis.astype(np.float32), rig,
        iters=prob.BA_ITERS, huber_px=prob.BA_HUBER_PX)
    assert np.allclose(z["poses"], np.array(ref.poses), atol=2e-2), (
        np.abs(z["poses"] - np.array(ref.poses)).max())

    # ---- live windowed pipeline ran 2-process: parity vs 1-process ----
    # The workers drove real window_vo steps with the in-step BA psums
    # crossing the process boundary; the trajectory must match the
    # SAME pipeline run single-process with an unsharded BA.
    assert z["ba_ran"].any(), z["ba_ran"]
    import jax.numpy as jnp
    from front_end_tpu.pipeline import window_vo

    vrig, wcfg, lefts, rights = prob.make_live_setup(ba_mesh=None)
    state = window_vo.init_state(vrig, wcfg)
    step = jax.jit(lambda s, l, r: window_vo.window_vo_step(
        s, l, r, vrig, wcfg))
    ref_traj = []
    for t in range(prob.LIVE_FRAMES):
        state, outw = step(state, jnp.asarray(lefts[t]),
                           jnp.asarray(rights[t]))
        ref_traj.append(np.asarray(outw.frame.pose))
    ref_traj = np.stack(ref_traj)
    assert np.allclose(z["traj"], ref_traj, atol=5e-3), (
        np.abs(z["traj"] - ref_traj).max())
