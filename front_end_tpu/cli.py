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
        batch=args.batch, ideal_only=args.ideal)
    print(json.dumps(stats))


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
        desc_bytes=32, ransac_hyps=256, ransac_threshold=0.5,
        max_disparity=192.0)

    poses_list = []
    if args.window:
        # live window mode: tracker + windowed Schur BA in the loop
        # (the reference's window_node / WindowMatcher pipeline)
        from front_end_tpu.pipeline import window_vo
        wcfg = window_vo.WindowVOConfig.create(
            cfg, window=args.window_size, ba_every=args.ba_every)
        state = window_vo.init_state(rig, wcfg)
        step = jax.jit(
            lambda s, l, r: window_vo.window_vo_step(s, l, r, rig, wcfg))
        for i, (l, r) in enumerate(DeviceFeed(frame_iter)):
            state, out = step(state, l, r)
            poses_list.append(np.array(out.frame.pose))
            if args.verbose and i % 25 == 0:
                print(f"frame {i}: stereo={int(out.frame.n_stereo)} "
                      f"inliers={int(out.frame.n_inliers)} "
                      f"tracked={int(out.n_tracked)} "
                      f"ba_rms={float(out.ba_rms_px):.2f}px")
        poses = np.stack(poses_list)
    else:
        state = vo.init_state(rig, cfg)
        step = jax.jit(lambda s, l, r: vo.vo_step(s, l, r, rig, cfg))
        motions = []
        for i, (l, r) in enumerate(DeviceFeed(frame_iter)):
            state, out = step(state, l, r)
            motions.append(np.array(out.motion))
            if args.verbose and i % 25 == 0:
                print(f"frame {i}: stereo={int(out.n_stereo)} "
                      f"inliers={int(out.n_inliers)}")
        poses = metrics.poses_from_motions(np.stack(motions))
    print(f"processed {len(poses)} frames"
          + (" (windowed BA mode)" if args.window else ""))
    if gt is not None:
        n = min(len(poses), len(gt))
        ate = metrics.ate_rmse(poses[:n, :3, 3], gt[:n, :3, 3])
        print(f"ATE RMSE: {ate:.3f} m")
    if args.out:
        np.savetxt(args.out, poses[:, :3, :].reshape(len(poses), 12))
        print(f"trajectory -> {args.out}")


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
    e.set_defaults(fn=cmd_extract_motion)

    r = sub.add_parser("ransac-smoke")
    r.add_argument("--seed", type=int, default=0)
    r.set_defaults(fn=cmd_ransac_smoke)

    v = sub.add_parser("vo")
    v.add_argument("--kitti", default=None, help="KITTI odometry root")
    v.add_argument("--seq", default="00")
    v.add_argument("--frames", type=int, default=None)
    v.add_argument("--set-point", type=int, default=2000)
    v.add_argument("--out", default=None)
    v.add_argument("--verbose", action="store_true")
    v.add_argument("--window", action="store_true",
                   help="live window mode: tracker + windowed BA")
    v.add_argument("--window-size", type=int, default=3)
    v.add_argument("--ba-every", type=int, default=1)
    v.set_defaults(fn=cmd_vo)

    b = sub.add_parser("bench")
    b.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
