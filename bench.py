"""Benchmark: stereo VO frames/s/chip at KITTI resolution.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

Baseline: the north-star target from BASELINE.json — KITTI 00 stereo VO at
>= 200 frames/s/chip (the reference's own operating budget was 15 fps on
a Bumblebee rig, `bin/result_ONE:69`).  vs_baseline = value / 200.

The headline value is the compute pipeline (adaptive grid FAST detection
on both images, BRIEF description, MXU stereo matching, triangulation,
inter-frame tracking, 3-point rigid RANSAC + LM polish) on synthetic
KITTI-sized (376×1241) stereo pairs, fed frame-by-frame from the host.
`detail` additionally reports:
  - fps_feed_inclusive: the SAME loop fed end-to-end through the native
    C++ decode ring (`csrc/feed.cc`) + `io.feed.DeviceFeed` prefetch from
    PGM files on disk — the honest whole-system number.  NOTE: on this
    build rig the TPU sits behind a remote tunnel whose measured
    host->device bandwidth is ~30 MB/s (full-res uint8 stereo =
    0.93 MB/frame -> a ~35-50 fps physical ceiling regardless of
    software); on hardware with a local PCIe link the same loop is
    compute-bound at fps_device_scan.  The decode ring itself sustains
    >2500 fps;
  - fps_windowed: the live window mode (tracker + windowed Schur BA
    every frame, `pipeline/window_vo.py`) — the reference window_node's
    pipeline shape.
"""
from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np

from front_end_tpu.utils import cache as _cache

_cache.enable()


def make_sequence(n_frames, h=376, w=1241, disp=12, shift=3, seed=5):
    rs = np.random.RandomState(seed)
    W_big = w + disp + shift * n_frames + 8
    big = np.full((h, W_big), 128.0, np.float32)
    for _ in range(2500):
        y, x = rs.randint(4, h - 16), rs.randint(4, W_big - 16)
        s = rs.randint(4, 14)
        big[y:y + s, x:x + s] = rs.uniform(10, 245)
    # per-pixel sensor-style texture: uniform squares tie every corner
    # score and cv2-exact NMS (ties annihilate) would suppress them all;
    # real KITTI frames never tie.
    big = np.clip(np.round(big + rs.normal(0, 2.0, big.shape)),
                  0, 255).astype(np.float32)
    lefts, rights = [], []
    for t in range(n_frames):
        off = t * shift
        lefts.append(big[:, off:off + w].copy())
        rights.append(big[:, off + disp:off + disp + w].copy())
    return np.stack(lefts), np.stack(rights)


def _write_pgm(path, img):
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        f.write(np.asarray(img, np.uint8).tobytes())


def _bench_feed_inclusive(step, state0, lefts, rights, rig):
    """End-to-end: PGM on disk -> native decode ring -> DeviceFeed
    prefetch -> jit step.  Returns fps or None when the native lib can't
    build on this machine."""
    import jax

    from front_end_tpu.io import feed as feed_mod
    from front_end_tpu.io import native_feed

    if not native_feed.available():
        return None
    n = len(lefts)
    with tempfile.TemporaryDirectory(prefix="fe_bench_") as d:
        lp, rp = [], []
        for i, (l, r) in enumerate(zip(lefts, rights)):
            lp.append(os.path.join(d, f"l{i:03d}.pgm"))
            rp.append(os.path.join(d, f"r{i:03d}.pgm"))
            _write_pgm(lp[-1], l)
            _write_pgm(rp[-1], r)

        def run_once():
            # uint8 straight from the decode ring: 4x fewer bytes over
            # the host->device link; vo_step casts to f32 on device.
            src = native_feed.NativeStereoFeed(
                lp, rp, rig.height, rig.width, ring=8, threads=4)
            dev = feed_mod.DeviceFeed(iter(src), depth=4)
            state = state0
            t0 = time.perf_counter()
            for L, R in dev:
                state, out = step(state, L, R)
            _sync(out.pose)
            dt = time.perf_counter() - t0
            src.close()
            return n / dt

        run_once()                       # warm (file cache + compile)
        return max(run_once() for _ in range(3))



def _sync(x) -> None:
    """True device synchronization.  On the remote-TPU (axon) backend
    `jax.block_until_ready` can return while execution is still queued
    (measured: a 40-step chain "completed" in 0.4 ms, then fetching one
    4x4 pose took 4.1 s) — only an actual device->host FETCH proves the
    work ran.  Every timing below ends with a fetch of a small output."""
    import numpy as _np
    _np.asarray(x)


def main():
    import jax
    import jax.numpy as jnp

    from front_end_tpu.geometry.camera import kitti_rig
    from front_end_tpu.ops import grid
    from front_end_tpu.pipeline import vo, window_vo

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

    # ---- headline: compute-pipeline fps, frames pre-staged on device ---
    L = [jax.device_put(jnp.asarray(x)) for x in lefts]
    R = [jax.device_put(jnp.asarray(x)) for x in rights]
    jax.block_until_ready(L[-1])

    # warmup: compile + settle thresholds
    for t in range(2):
        state, out = step(state, L[t], R[t])
    _sync(out.pose)

    # 5 passes over the sequence (200 dispatches), fetch-synchronized
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        for t in range(n_frames):
            state, out = step(state, L[t], R[t])
    _sync(out.pose)
    dt = time.perf_counter() - t0
    fps = reps * n_frames / dt

    # ---- device-only throughput: scanned chunk, one dispatch ----------
    # the per-frame loop above is host-dispatch-bound at ~0.2 ms/frame;
    # a lax.scan over the staged stack measures what the chip itself
    # sustains (the deployment shape for offline/batch processing).
    Ls = jnp.stack(L)
    Rs = jnp.stack(R)

    @jax.jit
    def scan_seq(s, ls, rs):
        return vo.run_sequence(s, ls, rs, rig, cfg)

    sstate0 = vo.init_state(rig, cfg)
    st, outs = scan_seq(sstate0, Ls, Rs)
    _sync(outs.pose[-1])
    t0 = time.perf_counter()
    for _ in range(reps):
        st, outs = scan_seq(st, Ls, Rs)
    _sync(outs.pose[-1])
    fps_scan = reps * n_frames / (time.perf_counter() - t0)

    # ---- BRIEF-16 variant: the reference's own live descriptor width --
    # (live_stereo.cpp:359 ran BriefDescriptorExtractor(16) = 128 bits).
    # +37% fps for ~6% worse rendered-world ATE; production keeps the
    # accuracy-optimal 256-bit config as the headline.
    bcfg = cfg.replace(desc_bytes=16)
    bstep = jax.jit(lambda s, l, r: vo.vo_step(s, l, r, rig, bcfg))
    bstate = vo.init_state(rig, bcfg)
    for t in range(2):
        bstate, bout = bstep(bstate, L[t], R[t])
    _sync(bout.pose)
    t0 = time.perf_counter()
    for _ in range(reps):
        for t in range(n_frames):
            bstate, bout = bstep(bstate, L[t], R[t])
    _sync(bout.pose)
    fps_b16 = reps * n_frames / (time.perf_counter() - t0)

    # ---- subpix variant: fps cost of cornerSubPix refinement -----------
    # (ATE effect measured by tests/test_rendered_world.py: +3% error on
    # the rendered world with the 0.75 px cap, 10x worse uncapped — so
    # production keeps subpix OFF; this records what it would cost.)
    scfg = cfg.replace(subpix=True)
    sstep = jax.jit(lambda s, l, r: vo.vo_step(s, l, r, rig, scfg))
    sstate = vo.init_state(rig, scfg)
    for t in range(2):
        sstate, sout = sstep(sstate, L[t], R[t])
    _sync(sout.pose)
    t0 = time.perf_counter()
    for _ in range(reps):
        for t in range(n_frames):
            sstate, sout = sstep(sstate, L[t], R[t])
    _sync(sout.pose)
    fps_subpix = reps * n_frames / (time.perf_counter() - t0)

    # ---- host->device link bandwidth (context for fps_feed_inclusive) --
    # distinct data each rep (the client dedupes repeats), completion
    # proven by fetching one element back.  On this rig's remote tunnel
    # this measures ~20-60 MB/s — the physical ceiling that makes
    # fps_feed_inclusive a link number, not a pipeline number.
    # NB both probes ship the BENCH'S OWN frames, not random bytes: the
    # tunnel compresses RPC payloads, so incompressible random data
    # understates what real (texture-sparse) frames achieve — r5
    # measured the feed sustaining ~42 MB/s effective through a link
    # whose random-data floor probed at ~11 MB/s.  Same-data probes make
    # ceiling and achieved feed throughput comparable in one unit.
    frame_blob = np.ascontiguousarray(
        np.stack(lefts[:8]).astype(np.uint8))
    h2d = []
    for rep in range(3):
        blob = frame_blob ^ rep            # distinct bytes, same entropy
        t0 = time.perf_counter()
        d = jax.device_put(blob)
        _ = np.asarray(d[0, 0, 0])
        h2d.append(blob.nbytes / 1e6 / (time.perf_counter() - t0))
    h2d_mbps = float(np.median(h2d))

    # ---- PIPELINED link bandwidth: what the feed actually achieves -----
    # one synchronous put understates the link (each transfer pays the
    # full RTT); the DeviceFeed issues puts back-to-back and overlaps
    # them with compute.  Measure the same shape: 8 frame-sized puts in
    # flight, sync once at the end — ceiling and achieved feed fps are
    # then comparable in the same units.
    h2d_pipe = []
    for rep in range(3):
        blobs = [np.ascontiguousarray(f ^ (rep + 1)) for f in frame_blob]
        t0 = time.perf_counter()
        devs = [jax.device_put(b) for b in blobs]
        for d in devs:
            _ = np.asarray(d[0, 0])
        h2d_pipe.append(sum(b.nbytes for b in blobs) / 1e6
                        / (time.perf_counter() - t0))
    h2d_pipe_mbps = float(np.median(h2d_pipe))

    # ---- per-stage on-chip breakdown (profile_stages.py, summarized) ---
    # which stage a regression lives in, carried in every BENCH record:
    # detect (grid FAST pair), extract = detect+describe+stereo-match+
    # triangulate, motion (interframe RANSAC+LM), tracker+BA =
    # windowed-step minus plain-step (derived below from fps).
    #
    # Measurement shape: the shared scan-amortized harness
    # (`front_end_tpu/utils/stagetime.py` — one implementation for this
    # file and profile_stages.py, so the dispatch-floor amortization and
    # the all-leaves DCE tap cannot drift between them).
    from front_end_tpu.ops import grid as grid_mod
    from front_end_tpu.utils import stagetime

    def _stage_ms(fn, *args, n=50):
        return stagetime.stage_ms(fn, *args, n=n, sync=_sync)[0]

    # the harness's own per-iteration floor (measured r5: a (8,)-add
    # inside the scan still costs ~0.5 ms/iter on this rig) — reported
    # so stage numbers can be read net of it; sub-ms stages are
    # floor-dominated and only comparable, not absolute.
    st_floor = _stage_ms(lambda x: x + 1.0, np.zeros(8, np.float32))

    st_detect = _stage_ms(
        lambda l, r, tl, tr: grid_mod.detect_pair(l, r, tl, tr, cfg.grid),
        L[0], R[0], state.thresholds_l, state.thresholds_r)
    st_extract = _stage_ms(
        lambda l, r, tl, tr: vo._extract_frame(l, r, tl, tr, rig, cfg),
        L[0], R[0], state.thresholds_l, state.thresholds_r)
    feats0 = jax.jit(lambda l, r, tl, tr: vo._extract_frame(
        l, r, tl, tr, rig, cfg))(L[0], R[0], state.thresholds_l,
                                 state.thresholds_r)[0]
    import jax.random as jrandom
    st_motion = _stage_ms(
        lambda k, c, p: vo._estimate_motion(k, c, p, rig, cfg),
        jrandom.PRNGKey(0), feats0, feats0)

    # ---- end-to-end (disk -> native decode -> prefetch -> step) --------
    fps_feed = _bench_feed_inclusive(step, vo.init_state(rig, cfg),
                                     lefts, rights, rig)

    # ---- accuracy: rendered-world 6-DoF ATE (plain + windowed) ---------
    # the bench line should carry the accuracy story too: 40 frames of
    # the ray-cast corridor (sim/render.py) with real rotation, scored
    # against exact ground truth.  Bound: tests/test_rendered_world.py
    # additionally checks these against the cv2-reference VO.
    from front_end_tpu.eval import metrics as metrics_mod
    from front_end_tpu.geometry.camera import StereoRig
    from front_end_tpu.sim import render as render_mod

    rrng = np.random.RandomState(11)
    rrig = StereoRig.create(fx=200.0, cx=127.5, cy=95.5, baseline=0.3,
                            width=256, height=192)
    scene = render_mod.corridor_scene(rrng, tex_size=384)
    gtT = render_mod.corridor_trajectory(40)
    rl, rr = render_mod.render_stereo_sequence(scene, rrig, gtT)
    rcfg = vo.VOConfig(
        grid=grid.GridConfig(grid_rows=2, grid_cols=3, cell_capacity=128,
                             set_point=700, init_threshold=12.0),
        desc_bytes=32, ransac_hyps=192, ransac_threshold=0.12,
        max_disparity=60.0, min_track_inliers=10)

    def run_traj(stepper, s, pose_of):
        poses = []
        for t in range(rl.shape[0]):
            s, o = stepper(s, jnp.asarray(rl[t]), jnp.asarray(rr[t]))
            poses.append(np.asarray(pose_of(o)))
        return np.stack(poses)

    rstep = jax.jit(lambda s, l, r: vo.vo_step(s, l, r, rrig, rcfg))
    traj_plain = run_traj(rstep, vo.init_state(rrig, rcfg), lambda o: o.pose)
    ate_plain = metrics_mod.ate_rmse(traj_plain[:, :3, 3], gtT[:, :3, 3])
    rwcfg = window_vo.WindowVOConfig.create(rcfg, window=3, ba_every=2,
                                            ba_iters=2)
    rwstep = jax.jit(
        lambda s, l, r: window_vo.window_vo_step(s, l, r, rrig, rwcfg))
    traj_win = run_traj(rwstep, window_vo.init_state(rrig, rwcfg),
                        lambda o: o.frame.pose)
    ate_win = metrics_mod.ate_rmse(traj_win[:, :3, 3], gtT[:, :3, 3])

    # ---- live window mode (tracker + windowed BA) ----------------------
    # operating point ba_every=2, iters=2: the measured (fps, ATE) curve
    # (bench_window.py, reports/r4/WINDOW_TRADEOFF.md) — >=200 fps with
    # 3.1x better ATE than frame-to-frame on the rendered 6-DoF world.
    wcfg = window_vo.WindowVOConfig.create(cfg, window=3, ba_every=2,
                                           ba_iters=2)
    wstate = window_vo.init_state(rig, wcfg)
    wstep = jax.jit(
        lambda s, l, r: window_vo.window_vo_step(s, l, r, rig, wcfg))
    for t in range(2):
        wstate, wout = wstep(wstate, L[t], R[t])
    _sync(wout.frame.pose)
    t0 = time.perf_counter()
    for _ in range(reps):
        for t in range(n_frames):
            wstate, wout = wstep(wstate, L[t], R[t])
    _sync(wout.frame.pose)
    fps_win = reps * n_frames / (time.perf_counter() - t0)

    result = {
        "metric": "kitti_stereo_vo_frames_per_s_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 200.0, 3),
        "detail": {
            "resolution": f"{rig.height}x{rig.width}",
            "keypoint_capacity": cfg.grid.capacity,
            "n_frames": reps * n_frames,
            "ms_per_frame": round(1000.0 * dt / (reps * n_frames), 3),
            "device": str(jax.devices()[0]),
            "n_inliers_last": int(out.n_inliers),
            "motion_ok_last": bool(out.motion_ok),
            "fps_feed_inclusive": (round(fps_feed, 2)
                                   if fps_feed else None),
            "h2d_link_mb_per_s": round(h2d_mbps, 1),
            "h2d_pipelined_mb_per_s": round(h2d_pipe_mbps, 1),
            "stage_ms": {
                "harness_floor": round(st_floor, 3),
                "detect_pair": round(st_detect, 3),
                "describe_match_triangulate": round(
                    max(st_extract - st_detect, 0.0), 3),
                "extract_total": round(st_extract, 3),
                "motion_ransac_lm": round(st_motion, 3),
                "tracker_ba_overhead": round(
                    1000.0 / max(fps_win, 1e-9)
                    - 1000.0 / max(fps, 1e-9), 3),
                # stages timed as one on-device scan (amortizing the
                # ~1-2 ms/dispatch remote floor); the fused step shares
                # work across stage boundaries (e.g. one smooth feeds
                # both describe passes), so the sum bounds — not equals
                # — ms_per_frame.  harness_floor is the scan's own
                # per-iteration cost (a trivial op measures ~0.5 ms on
                # this rig): read each stage net of it.
                "note": "on-chip scan-amortized; fused step dedups "
                        "cross-stage work, so sum >= ms_per_frame; "
                        "subtract harness_floor from each stage",
            },
            "roofline": (
                f"feed {round(fps_feed, 1) if fps_feed else 0} fps x "
                f"{0.93:.2f} MB/frame = "
                f"{round((fps_feed or 0) * 0.93, 1)} MB/s effective "
                f"(nominal bytes; tunnel compresses real frames on the "
                f"wire) vs {round(h2d_mbps, 1)} MB/s one batched put / "
                f"{round(h2d_pipe_mbps, 1)} MB/s frame-sized sequential "
                f"puts (the feed's transfer shape — puts serialize on "
                f"this tunnel, the feed wins by overlapping decode + "
                f"compute); compute is VPU/gather-bound at this "
                f"resolution (detect {st_detect:.2f} ms is dense "
                f"stencils + top-k, not MXU matmul)"),
            "fps_subpix_on": round(fps_subpix, 2),
            "fps_brief16": round(fps_b16, 2),
            "fps_device_scan": round(fps_scan, 2),
            "fps_windowed": round(fps_win, 2),
            "windowed_ba_ran_last": bool(wout.ba_ran),
            "windowed_n_tracked_last": int(wout.n_tracked),
            "ate_rendered_world_m": round(float(ate_plain), 4),
            "ate_rendered_world_windowed_m": round(float(ate_win), 4),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    # the remote-TPU tunnel occasionally drops a compile RPC mid-flight
    # ("response body closed before all bytes were read"); one retry in
    # a fresh attempt recovers — better than the round recording no
    # bench at all.
    try:
        main()
    except Exception as e:                      # pragma: no cover
        import sys
        import time as _t
        print(f"bench attempt 1 failed ({type(e).__name__}: {e}); "
              "retrying once", file=sys.stderr)
        _t.sleep(5)
        main()
