"""Command-line entry points — the `bin/` executables of the framework.

`python -m front_end_tpu.cli <command>` replaces the reference's rosrun
scripts (SURVEY §2.3):

  gen-table        <- bin/genDetectorDescriptorTable
  detect-sweep     <- bin/feature_node singleImageDetection service
  extract-motion   <- bin/extractMotion / extractNister / extractBA
  ransac-smoke     <- bin/ransac
  vo               <- detect_node + stereo_node + window_node pipeline
                      (runs on a KITTI sequence dir or synthetic frames)
  bench            <- bin/result_* benchmark protocol (single chip)
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def cmd_gen_table(args):
    from front_end_tpu import features
    n = features.export_table_yaml(args.out)
    det = len(features.detector_table())
    desc = len(features.descriptor_table())
    print(f"wrote {n} entries to {args.out} (detectors={det}, "
          f"descriptors={desc})")


def cmd_detect_sweep(args):
    import jax.numpy as jnp

    from front_end_tpu import features, services

    if args.image:
        from front_end_tpu.io.kitti import _read_image
        left = right = _read_image(args.image)
    else:
        from bench import make_sequence
        L, R = make_sequence(1)
        left, right = L[0], R[0]
    table = features.detector_table()
    ids = [k for k, v in table.items() if v["Name"] == args.family][: args.n]
    res = services.single_image_detection(ids, left, right)
    for r in res:
        if not r["supported"]:
            continue
        print(f"{r['detID']}: L={r['leftFeatures']['nPoints']} "
              f"R={r['rightFeatures']['nPoints']} "
              f"t={r['processingTime'][0]['seconds']*1000:.2f}ms")


def cmd_extract_motion(args):
    from front_end_tpu.analysis import sweeps
    stats = sweeps.run_study(
        args.out, methods=tuple(args.methods.split(",")),
        speeds=tuple(args.speeds.split(",")),
        curves=tuple(int(c) for c in args.curves.split(",")),
        batch=args.batch, ideal_only=args.ideal,
        devices=args.devices)
    print(json.dumps(stats))


def cmd_ba_scaling(args):
    """Distributed-BA scaling report: run the landmark-sharded Schur LM
    solver at 1/2/4/.../N devices on one synthetic window problem and
    report {n_devices: seconds, efficiency} (BASELINE.md: >=80% scaling
    efficiency with reported 1-chip/1-host/N-host points).

    With --multihost, initializes `jax.distributed` first (auto-detected
    on TPU pods) so the landmark mesh spans every host.
    """
    import time

    import jax
    import jax.numpy as jnp

    from front_end_tpu.ba import distributed
    from front_end_tpu.eval import metrics
    from front_end_tpu.geometry import se3
    from front_end_tpu.geometry.camera import StereoRig
    from front_end_tpu.sim import synthetic as sim

    if args.multihost:
        distributed.initialize_multihost()
    n_dev = len(jax.devices())
    W, L = args.window, args.landmarks
    rig = StereoRig.create(fx=300.0, cx=160.0, cy=120.0, baseline=0.3,
                           width=320, height=240)
    cat = sim.motion_category("medium")
    key = jax.random.PRNGKey(args.seed)
    Ts = [jnp.eye(4)]
    for _ in range(W - 1):
        key, k = jax.random.split(key)
        _, Ht = sim.sample_motion(k, cat)
        Ts.append(Ht @ Ts[-1])
    T = jnp.stack(Ts)
    key, k = jax.random.split(key)
    world = sim.sample_world(k, rig, cat, L)
    Xc = jax.vmap(lambda Tw: se3.transform_points(Tw, world.Xa))(T)
    meas = jnp.swapaxes(jax.vmap(rig.project4)(Xc), 0, 1)
    vis = jnp.swapaxes(jax.vmap(rig.in_view)(Xc), 0, 1) & \
        world.valid[:, None]
    key, kn, kp = jax.random.split(key, 3)
    meas = meas + args.noise_px * jax.random.normal(kn, meas.shape)
    dxi = 0.01 * jax.random.normal(kp, (W, 6)).at[0].set(0.0)
    T0 = np.asarray(jax.vmap(lambda d, t: se3.se3_exp(d) @ t)(dxi, T))
    Xp, measp, visp = map(np.asarray, distributed.pad_landmarks(
        world.Xa, meas, vis, n_dev))

    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev]
    if n_dev not in sizes:
        sizes.append(n_dev)
    # On a virtual (host-platform) mesh every "device" time-slices one
    # host, so wall-clock is not comparable across mesh sizes; process
    # CPU-seconds measure the distribution overhead a real slice would
    # see (modeled per-chip time = cpu(n)/n).  Real multi-chip hardware
    # uses wall-clock directly.
    virtual = jax.devices()[0].platform == "cpu"
    wall, cpu, results = {}, {}, {}
    for s in sizes:
        mesh = distributed.make_mesh(s)
        run = lambda: distributed.ba_solve_sharded(
            mesh, T0, Xp, measp, visp, rig, iters=args.iters)
        r = run()
        jax.block_until_ready(r.poses)       # compile
        results[s] = r
        wall[s] = cpu[s] = float("inf")
    for _rep in range(args.repeats):         # interleave: decorrelate load
        for s in sizes:
            mesh = distributed.make_mesh(s)
            t0, c0 = time.perf_counter(), time.process_time()
            r = distributed.ba_solve_sharded(
                mesh, T0, Xp, measp, visp, rig, iters=args.iters)
            jax.block_until_ready(r.poses)
            wall[s] = min(wall[s], time.perf_counter() - t0)
            cpu[s] = min(cpu[s], time.process_time() - c0)
    for s in sizes:
        r = results[s]
        print(f"n={s}: wall {wall[s]*1e3:.1f} ms  cpu {cpu[s]*1e3:.1f} ms  "
              f"cost {float(r.cost):.1f} (from {float(r.cost0):.1f}) "
              f"rms {float(r.rms_px):.2f}px")
    times = cpu if virtual else wall
    eff = metrics.scaling_efficiency(
        {n: n * Xp.shape[0] / t for n, t in times.items()})
    print(json.dumps({
        "n_hosts": jax.process_count(),
        "n_devices": n_dev,
        "virtual_mesh": virtual,
        "landmarks": int(Xp.shape[0]),
        "window": W,
        "wall_ms": {str(n): round(t * 1e3, 2) for n, t in wall.items()},
        "cpu_ms": {str(n): round(t * 1e3, 2) for n, t in cpu.items()},
        "efficiency": {str(n): round(e, 3) for n, e in eff.items()},
    }))


def cmd_ransac_smoke(args):
    """bin/ransac: 200 landmarks under known Slow motion; print recovered
    vs ideal R, T (`bin/ransac:68-144`)."""
    import jax
    import jax.numpy as jnp

    from front_end_tpu.geometry import se3
    from front_end_tpu.geometry.camera import bumblebee_rig
    from front_end_tpu.motion import ransac
    from front_end_tpu.sim import synthetic as sim

    rig = bumblebee_rig()
    w = sim.sample_world(jax.random.PRNGKey(args.seed), rig,
                         sim.motion_category("slow"), 200)
    res = ransac.rigid_ransac(jax.random.PRNGKey(args.seed + 1),
                              w.Xa, w.Xb, w.valid)
    ang_i, t_i = se3.get_motion(w.Ht)
    ang_e, t_e = se3.get_motion(res.H)
    print("ideal     rpy=", np.array(ang_i), " t=", np.array(t_i))
    print("recovered rpy=", np.array(ang_e), " t=", np.array(t_e))
    print("inliers:", int(res.n_inliers))


def cmd_vo(args):
    import jax
    import jax.numpy as jnp

    from front_end_tpu.eval import metrics
    from front_end_tpu.io.feed import DeviceFeed
    from front_end_tpu.ops import grid
    from front_end_tpu.pipeline import vo

    if args.kitti:
        from front_end_tpu.io.kitti import KittiSequence
        seq = KittiSequence(args.kitti, args.seq, max_frames=args.frames)
        rig = seq.rig
        frame_iter = seq.frames()
        gt = seq.poses
    elif args.euroc:
        from front_end_tpu.io.euroc import EurocSequence
        seq = EurocSequence(args.euroc, args.seq, max_frames=args.frames,
                            rectify=True)
        rig = seq.rig
        frame_iter = seq.frames()
        gt = None
    else:
        from bench import make_sequence
        from front_end_tpu.geometry.camera import kitti_rig
        rig = kitti_rig()
        L, R = make_sequence(args.frames or 40, h=rig.height, w=rig.width)
        frame_iter = zip(L, R)
        gt = None

    cfg = vo.VOConfig(
        grid=grid.GridConfig(cell_capacity=384, set_point=args.set_point,
                             init_threshold=15.0),
        descriptor=args.descriptor,
        desc_bytes=32, ransac_hyps=256, ransac_threshold=0.5,
        max_disparity=192.0)

    # --resume: restore carried state + prior trajectory, skip the
    # frames already processed — the reference's batch resume semantics
    # (`bin/extractMotion:59` skip-if-exists) for the live pipeline,
    # backed by the exact-resume-tested pytree checkpoint
    # (`utils/checkpoint.py` <- serializeWindow, algorithm.py:119-143).
    from front_end_tpu.utils import checkpoint as ckpt_mod
    n_done = 0
    prior_poses = []
    if args.resume:
        import json as json_mod
        with open(args.resume + ".meta.json") as f:
            meta = json_mod.load(f)
        n_done = int(meta["n_processed"])
        if meta["window"] != bool(args.window) or \
                meta["descriptor"] != args.descriptor:
            raise SystemExit("resume config mismatch: checkpoint was "
                             f"{meta}, flags differ")
        prior_poses = list(
            np.load(args.resume + ".traj.npy"))
        print(f"resuming after {n_done} frames from {args.resume}")

    def skip_done(it):
        for i, pair in enumerate(it):
            if i >= n_done:
                yield pair

    # --record: per-frame telemetry stream (the rosbag-recording
    # workflow of `launch/recordStereo.xml` + `bin/result_ONE`): frame
    # wall time and pipeline counters persisted for `cli report
    # --record` to plot from, without re-running anything.
    from front_end_tpu.pipeline import telemetry
    tlog = telemetry.TelemetryLog() if args.record else None

    # --debug-images: the reference publishes drawn stereo-match images
    # and anaglyph track overlays continuously while running
    # (features.py:752-760, algorithm.py:1198-1202, visualize.py:7-74);
    # here every Nth frame is rendered from the live step's own state
    # (uv4 stereo rows, track correspondences) and written to DIR.
    def dump_debug(i, l, r, feats, frame_out):
        if not args.debug_images or i % args.debug_every:
            return
        import os as os_mod

        from front_end_tpu.analysis.explore import _imwrite
        from front_end_tpu.viz import draw
        os_mod.makedirs(args.debug_images, exist_ok=True)
        ln, rn = np.asarray(l), np.asarray(r)
        _imwrite(os_mod.path.join(args.debug_images,
                                  f"match_{i:05d}.png"),
                 draw.draw_stereo_uv4(ln, rn, np.asarray(feats.uv4),
                                      np.asarray(feats.stereo_valid)))
        canvas = draw.anaglyph(ln, rn)
        _imwrite(os_mod.path.join(args.debug_images,
                                  f"tracks_{i:05d}.png"),
                 draw.draw_tracks(canvas,
                                  np.asarray(frame_out.track_xy_prev),
                                  np.asarray(feats.kps.xy),
                                  np.asarray(frame_out.track_inliers),
                                  np.asarray(frame_out.track_valid)))

    poses_list = [np.asarray(p) for p in prior_poses]
    if args.window:
        # live window mode: tracker + windowed Schur BA in the loop
        # (the reference's window_node / WindowMatcher pipeline)
        from front_end_tpu.pipeline import window_vo
        # --shard-ba N: run the per-window BA landmark-sharded over the
        # first N devices (the live multi-chip mode; ba/distributed.py).
        # On a multi-chip slice the psums ride ICI; on this rig's single
        # chip it degenerates to N=1, and the CPU-mesh tests exercise
        # N=8 (tests/test_sharded_window.py).
        ba_mesh = None
        ba_max_landmarks = 1024          # measured knee (WINDOW_TRADEOFF)
        if args.shard_ba:
            from front_end_tpu.ba import distributed as dist_mod
            n = min(args.shard_ba, len(jax.devices()))
            ba_mesh = dist_mod.make_mesh(n)
            ba_max_landmarks = -(-1024 // n) * n
            print(f"windowed BA sharded over {n} device(s) "
                  f"(landmark axis)")
        wcfg = window_vo.WindowVOConfig.create(
            cfg, window=args.window_size, ba_every=args.ba_every,
            ba_mesh=ba_mesh, ba_max_landmarks=ba_max_landmarks)
        if args.max_age is not None:
            # track-retention horizon; the measured companion knob for
            # longer windows (W=6 + max_age=5 -> 0.0177 m rendered ATE,
            # reports/r5/WINDOW_TRADEOFF.md)
            wcfg = wcfg.replace(
                tracker=wcfg.tracker.replace(max_age=args.max_age))
        # frames must not be committed to a single device when the step
        # contains a shard_map over the mesh: feed them replicated
        feed_device = None
        if ba_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            feed_device = NamedSharding(ba_mesh, PartitionSpec())
        state = window_vo.init_state(rig, wcfg)
        if args.resume:
            state = ckpt_mod.load_pytree(args.resume, state)
        step = jax.jit(
            lambda s, l, r: window_vo.window_vo_step(s, l, r, rig, wcfg))
        for i, (l, r) in enumerate(DeviceFeed(skip_done(frame_iter),
                                              device=feed_device)):
            if tlog is not None:
                # the fetch must sit INSIDE the timed region:
                # block_until_ready can return before execution
                # finishes on the remote-TPU backend (see bench._sync)
                with telemetry.FrameClock(tlog):
                    state, out = step(state, l, r)
                    pose_np = np.asarray(out.frame.pose)
                tlog.count("n_detect_l", out.frame.n_detect_l)
                tlog.count("n_stereo", out.frame.n_stereo)
                tlog.count("n_inliers", out.frame.n_inliers)
                tlog.count("n_tracked", out.n_tracked)
                tlog.count("ba_rms_px", out.ba_rms_px)
            else:
                state, out = step(state, l, r)
                pose_np = np.array(out.frame.pose)
            poses_list.append(pose_np)
            dump_debug(i, l, r, state.vo.prev, out.frame)
            if args.verbose and i % 25 == 0:
                print(f"frame {i}: stereo={int(out.frame.n_stereo)} "
                      f"inliers={int(out.frame.n_inliers)} "
                      f"tracked={int(out.n_tracked)} "
                      f"ba_rms={float(out.ba_rms_px):.2f}px")
        poses = (np.stack(poses_list) if poses_list
                 else np.zeros((0, 4, 4)))
    else:
        state = vo.init_state(rig, cfg)
        if args.resume:
            state = ckpt_mod.load_pytree(args.resume, state)
        step = jax.jit(lambda s, l, r: vo.vo_step(s, l, r, rig, cfg))
        for i, (l, r) in enumerate(DeviceFeed(skip_done(frame_iter))):
            if tlog is not None:
                with telemetry.FrameClock(tlog):     # fetch = sync
                    state, out = step(state, l, r)
                    pose_np = np.asarray(out.pose)
                tlog.count("n_detect_l", out.n_detect_l)
                tlog.count("n_stereo", out.n_stereo)
                tlog.count("n_tracks", out.n_tracks)
                tlog.count("n_inliers", out.n_inliers)
            else:
                state, out = step(state, l, r)
                pose_np = np.array(out.pose)
            poses_list.append(pose_np)
            dump_debug(i, l, r, state.prev, out)
            if args.verbose and i % 25 == 0:
                print(f"frame {i}: stereo={int(out.n_stereo)} "
                      f"inliers={int(out.n_inliers)}")
        poses = (np.stack(poses_list) if poses_list
                 else np.zeros((0, 4, 4)))
    print(f"processed {len(poses)} frames"
          + (" (windowed BA mode)" if args.window else ""))
    if tlog is not None:
        rec_path = telemetry.save_log(args.record, tlog, meta={
            "descriptor": args.descriptor, "window": bool(args.window),
            "platform": str(jax.devices()[0]),
            "resolution": f"{rig.height}x{rig.width}"})
        print(f"telemetry recording -> {rec_path}")
    if args.save_state:
        import json as json_mod
        ckpt_mod.save_pytree(args.save_state, state)
        np.save(args.save_state + ".traj.npy", poses)
        with open(args.save_state + ".meta.json", "w") as f:
            json_mod.dump({"n_processed": int(len(poses)),
                           "window": bool(args.window),
                           "descriptor": args.descriptor}, f)
        print(f"state -> {args.save_state} (+ .traj.npy, .meta.json)")
    if gt is not None and len(poses):
        n = min(len(poses), len(gt))
        ate = metrics.ate_rmse(poses[:n, :3, 3], gt[:n, :3, 3])
        print(f"ATE RMSE: {ate:.3f} m")
    if args.out:
        np.savetxt(args.out, poses[:, :3, :].reshape(len(poses), 12))
        print(f"trajectory -> {args.out}")


def cmd_report(args):
    """Render study + live plots into PNG figures and REPORT.md — the
    `bin/result_ONE..FOUR` and operating-curve capability."""
    from front_end_tpu.analysis import report as report_mod

    frames = None
    if args.kitti:
        from front_end_tpu.io.kitti import KittiSequence
        seq = KittiSequence(args.kitti, args.seq, max_frames=args.frames)
        pairs = list(seq.frames())
        frames = (np.stack([p[0] for p in pairs]),
                  np.stack([p[1] for p in pairs]))
    path = report_mod.generate_report(
        args.study, args.out, frames=frames,
        with_timings=not args.no_timings, bench_json=args.bench_json,
        records=args.record)
    print(f"report -> {path}")


def cmd_explore(args):
    from front_end_tpu.analysis import explore as explore_mod
    explore_mod.explore_features(
        family=args.family, out=args.out, image=args.image,
        n_frames=args.frames, top=args.top)


def cmd_bench(args):
    import bench
    bench.main()


def main(argv=None):
    from front_end_tpu.utils import cache as _cache
    _cache.enable()

    p = argparse.ArgumentParser(prog="front_end_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen-table")
    g.add_argument("--out", default="detectorLookupTable.yaml")
    g.set_defaults(fn=cmd_gen_table)

    d = sub.add_parser("detect-sweep")
    d.add_argument("--family", default="FAST")
    d.add_argument("--n", type=int, default=10)
    d.add_argument("--image", default=None)
    d.set_defaults(fn=cmd_detect_sweep)

    e = sub.add_parser("extract-motion")
    e.add_argument("--out", default="/tmp/fe_tpu_study")
    e.add_argument("--methods", default="PCL,Nister,BA")
    e.add_argument("--speeds", default="slow,medium,fast")
    e.add_argument("--curves", default="100,250,500")
    e.add_argument("--batch", type=int, default=64)
    e.add_argument("--ideal", action="store_true")
    e.add_argument("--devices", type=int, default=None,
                   help="shard each condition's world batch over N "
                        "devices (Monte-Carlo data parallelism)")
    e.set_defaults(fn=cmd_extract_motion)

    bs = sub.add_parser("ba-scaling")
    bs.add_argument("--landmarks", type=int, default=32768)
    bs.add_argument("--window", type=int, default=3)
    bs.add_argument("--iters", type=int, default=8)
    bs.add_argument("--repeats", type=int, default=3)
    bs.add_argument("--noise-px", type=float, default=0.5)
    bs.add_argument("--seed", type=int, default=0)
    bs.add_argument("--multihost", action="store_true")
    bs.set_defaults(fn=cmd_ba_scaling)

    r = sub.add_parser("ransac-smoke")
    r.add_argument("--seed", type=int, default=0)
    r.set_defaults(fn=cmd_ransac_smoke)

    v = sub.add_parser("vo")
    v.add_argument("--kitti", default=None, help="KITTI odometry root")
    v.add_argument("--euroc", default=None,
                   help="EuRoC root (rectified on the fly)")
    v.add_argument("--seq", default="00")
    v.add_argument("--frames", type=int, default=None)
    v.add_argument("--set-point", type=int, default=2000)
    v.add_argument("--descriptor", default="brief",
                   choices=["brief", "brief_pallas", "orb", "surf",
                            "surf_ext", "freak", "brisk"],
                   help="live descriptor (reference swap set, "
                        "bin/detect_node:24-54); surf/surf_ext match "
                        "with L2, the rest with Hamming")
    v.add_argument("--out", default=None)
    v.add_argument("--verbose", action="store_true")
    v.add_argument("--window", action="store_true",
                   help="live window mode: tracker + windowed BA")
    v.add_argument("--window-size", type=int, default=3)
    v.add_argument("--ba-every", type=int, default=1)
    v.add_argument("--max-age", type=int, default=None,
                   help="landmark track-retention horizon in frames "
                        "(default 3; pair --window-size 6 with 5)")
    v.add_argument("--shard-ba", type=int, default=0, metavar="N",
                   help="shard the live windowed BA's landmark blocks "
                        "over the first N devices (0 = single-device)")
    v.add_argument("--debug-images", default=None, metavar="DIR",
                   help="write live match overlays + anaglyph track "
                        "images every --debug-every frames to DIR (the "
                        "reference's continuous debug-image publishing)")
    v.add_argument("--debug-every", type=int, default=10)
    v.add_argument("--record", default=None, metavar="PATH",
                   help="record per-frame telemetry (frame time + "
                        "counters) to PATH (.npz) for `report --record`")
    v.add_argument("--save-state", default=None, metavar="PATH",
                   help="checkpoint the carried pipeline state + "
                        "trajectory after the run (.npz pytree)")
    v.add_argument("--resume", default=None, metavar="PATH",
                   help="restore a --save-state checkpoint and continue "
                        "from the next unprocessed frame")
    v.set_defaults(fn=cmd_vo)

    rp = sub.add_parser("report")
    rp.add_argument("--study", default=None,
                    help="extract-motion output dir (operating curves)")
    rp.add_argument("--out", default="/tmp/fe_tpu_report")
    rp.add_argument("--kitti", default=None)
    rp.add_argument("--seq", default="00")
    rp.add_argument("--frames", type=int, default=12)
    rp.add_argument("--no-timings", action="store_true")
    rp.add_argument("--bench-json", default=None)
    rp.add_argument("--record", action="append", default=[],
                    metavar="PATH",
                    help="telemetry recording(s) from `vo --record` to "
                         "render (repeatable)")
    rp.set_defaults(fn=cmd_report)

    x = sub.add_parser("explore")
    x.add_argument("--family", default="FAST")
    x.add_argument("--out", default="/tmp/fe_tpu_explore")
    x.add_argument("--image", default=None)
    x.add_argument("--frames", type=int, default=4)
    x.add_argument("--top", type=int, default=12)
    x.set_defaults(fn=cmd_explore)

    b = sub.add_parser("bench")
    b.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
