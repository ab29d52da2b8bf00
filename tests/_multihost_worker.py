"""Worker process for the 2-process jax.distributed smoke test.

Each process owns ONE CPU device; the landmark mesh spans both, so the
psum-reduced camera system in `ba_solve_sharded` actually crosses the
process boundary (the DCN path `initialize_multihost` promises).

The problem definitions are shared with the in-process reference run
(`_multihost_problem.py`) so the parity assertion in test_multihost.py
compares identical problems by construction.

Usage: python _multihost_worker.py <coordinator> <n_procs> <proc_id> <out>
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import _multihost_problem as prob  # noqa: E402


def main():
    coord, n_procs, proc_id, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    from front_end_tpu.ba import distributed

    mesh = distributed.initialize_multihost(
        coordinator_address=coord, num_processes=n_procs,
        process_id=proc_id)
    assert jax.process_count() == n_procs, jax.process_count()
    assert len(jax.devices()) == n_procs, jax.devices()

    # identical problem on every process (same seed, shared builder)
    rig, T0, _T_gt, X0, meas, vis = prob.make_ba_problem()

    # build GLOBAL arrays spanning both processes from replicated host
    # data: landmark-sharded inputs, replicated poses
    from jax.sharding import NamedSharding, PartitionSpec as P
    lm = NamedSharding(mesh, P(distributed.AXIS))

    def globalize(arr, sharding):
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx])

    Xg = globalize(X0, lm)
    measg = globalize(meas, lm)
    visg = globalize(vis.astype(np.float32), lm)

    res = distributed.ba_solve_sharded(
        mesh, T0, Xg, measg, visg, rig,
        iters=prob.BA_ITERS, huber_px=prob.BA_HUBER_PX)
    poses = np.asarray(res.poses)       # replicated -> locally readable
    cost = float(res.cost)

    # ---- the LIVE windowed pipeline, 2-process ------------------------
    # Every process runs the SAME jitted window_vo_step whose in-step
    # BA shard_map spans both processes' devices: detection/tracking is
    # replicated, the reduced camera system crosses the process
    # boundary each LM iteration — the whole running system distributed,
    # like the reference's ROS graph, not just a batch solver.
    import jax.numpy as jnp
    from front_end_tpu.pipeline import window_vo

    vrig, wcfg, lefts, rights = prob.make_live_setup(ba_mesh=mesh)

    rep = NamedSharding(mesh, P())
    state = jax.device_put(window_vo.init_state(vrig, wcfg), rep)
    step = jax.jit(lambda s, l, r: window_vo.window_vo_step(
        s, l, r, vrig, wcfg))
    traj, ba_ran = [], []
    for t in range(prob.LIVE_FRAMES):
        lg = jax.device_put(jnp.asarray(lefts[t]), rep)
        rg = jax.device_put(jnp.asarray(rights[t]), rep)
        state, outw = step(state, lg, rg)
        traj.append(np.asarray(outw.frame.pose))
        ba_ran.append(bool(np.asarray(outw.ba_ran)))
    traj = np.stack(traj)

    if proc_id == 0:
        np.savez(out_path, poses=poses, cost=cost,
                 cost0=float(res.cost0), traj=traj,
                 ba_ran=np.asarray(ba_ran))
    print(f"proc {proc_id}: cost {float(res.cost0):.2f} -> {cost:.2f}; "
          f"live windowed {prob.LIVE_FRAMES} frames, ba_ran={ba_ran}")


if __name__ == "__main__":
    main()
