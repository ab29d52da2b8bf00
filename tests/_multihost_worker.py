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
    if proc_id == 0:
        np.savez(out_path, poses=poses, cost=cost,
                 cost0=float(res.cost0))
    print(f"proc {proc_id}: cost {float(res.cost0):.2f} -> {cost:.2f}")


if __name__ == "__main__":
    main()
