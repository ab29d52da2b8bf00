"""Worker process for the 2-process jax.distributed smoke test.

Each process owns ONE CPU device; the landmark mesh spans both, so the
psum-reduced camera system in `ba_solve_sharded` actually crosses the
process boundary (the DCN path `initialize_multihost` promises).

Usage: python _multihost_worker.py <coordinator> <n_procs> <proc_id> <out>
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    coord, n_procs, proc_id, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    from front_end_tpu.ba import distributed
    from front_end_tpu.geometry.camera import StereoRig

    mesh = distributed.initialize_multihost(
        coordinator_address=coord, num_processes=n_procs,
        process_id=proc_id)
    assert jax.process_count() == n_procs, jax.process_count()
    assert len(jax.devices()) == n_procs, jax.devices()

    # identical problem on every process (same seed)
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

    res = distributed.ba_solve_sharded(mesh, T0, Xg, measg, visg, rig,
                                       iters=6, huber_px=2.0)
    poses = np.asarray(res.poses)       # replicated -> locally readable
    cost = float(res.cost)

    # ---- the LIVE windowed pipeline, 2-process ------------------------
    # Every process runs the SAME jitted window_vo_step whose in-step
    # BA shard_map spans both processes' devices: detection/tracking is
    # replicated, the reduced camera system crosses the process
    # boundary each LM iteration — the whole running system distributed,
    # like the reference's ROS graph, not just a batch solver.
    import jax.numpy as jnp
    from __graft_entry__ import _make_sequence
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
        ba_max_landmarks=128, ba_mesh=mesh)
    lefts, rights = _make_sequence(4, h, w)

    from jax.sharding import NamedSharding as NS
    rep = NS(mesh, P())
    state = jax.device_put(window_vo.init_state(vrig, wcfg), rep)
    step = jax.jit(lambda s, l, r: window_vo.window_vo_step(
        s, l, r, vrig, wcfg))
    traj, ba_ran = [], []
    for t in range(4):
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
          f"live windowed 4 frames, ba_ran={ba_ran}")


if __name__ == "__main__":
    main()
