"""Per-stage timing telemetry — the `ProcTime` observability primitive.

The reference attaches {label, seconds} records to nearly every message
(`/root/reference/msg/ProcTime.msg`; emitters at `bin/feature_node:27-34`,
`WindowMatcher.cpp:86-287`, `live_stereo.cpp:384-392`).  Under XLA the
whole frame is one fused program, so two modes are provided:

- `FrameClock` — wall-clock of the fused step (production mode; the sum
  of reference stage times corresponds to this single number);
- `staged_timings` — runs the pipeline's stages as separate blocking
  jit programs to recover a reference-style per-stage breakdown (for
  diagnosis/plots; slower than the fused path by design).

Records aggregate into `TelemetryLog`, the analogue of the
`stereo/time/*` debug topics, and serialize to plain dicts for the
analysis/report layer (`front_end_tpu.analysis`).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import NamedTuple

import jax


class ProcTime(NamedTuple):
    label: str
    seconds: float


@dataclass
class TelemetryLog:
    frames: list = field(default_factory=list)   # list[list[ProcTime]]
    counters: dict = field(default_factory=dict)  # label -> list[float]

    def add_frame(self, records):
        self.frames.append(list(records))

    def count(self, label, value):
        self.counters.setdefault(label, []).append(float(value))

    def stage_means(self):
        agg = {}
        for fr in self.frames:
            for r in fr:
                agg.setdefault(r.label, []).append(r.seconds)
        return {k: sum(v) / len(v) for k, v in agg.items()}

    def to_dict(self):
        return {"stage_means_s": self.stage_means(),
                "counters": {k: list(v) for k, v in self.counters.items()}}


def save_log(path: str, log: TelemetryLog, meta: dict | None = None):
    """Persist a run's telemetry stream (.npz) — the analogue of the
    reference's rosbag recordings (`launch/recordStereo.xml`): per-frame
    stage times + counter series, so `analysis.report` can plot FROM THE
    RECORDING instead of re-running the pipeline (`bin/result_ONE:60-91`
    plots recorded bags)."""
    import json

    import numpy as np

    labels = sorted({r.label for fr in log.frames for r in fr})
    arrs = {}
    for lb in labels:
        series = []
        for fr in log.frames:
            vals = [r.seconds for r in fr if r.label == lb]
            series.append(vals[0] if vals else np.nan)
        arrs[f"stage_{lb}"] = np.asarray(series, np.float64)
    for k, v in log.counters.items():
        arrs[f"counter_{k}"] = np.asarray(v, np.float64)
    arrs["_meta"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    path = path if path.endswith(".npz") else path + ".npz"
    np.savez(path, **arrs)
    return path


def load_log(path: str):
    """-> (stages: {label: (T,) seconds}, counters: {label: (T,)},
    meta: dict)."""
    import json

    import numpy as np

    if not path.endswith(".npz"):
        path = path + ".npz"
    stages, counters, meta = {}, {}, {}
    with np.load(path) as z:
        for k in z.files:
            if k.startswith("stage_"):
                stages[k[len("stage_"):]] = z[k]
            elif k.startswith("counter_"):
                counters[k[len("counter_"):]] = z[k]
            elif k == "_meta":
                meta = json.loads(z[k].tobytes().decode() or "{}")
    return stages, counters, meta


class FrameClock:
    """Times a fused frame step with a device sync, ProcTime-style."""

    def __init__(self, log: TelemetryLog, label: str = "frame"):
        self.log = log
        self.label = label

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.log.add_frame([ProcTime(self.label,
                                     time.perf_counter() - self.t0)])
        return False


def timed(label: str, fn, *args):
    """Run `fn(*args)`, block until the device result is ready, return
    (result, ProcTime)."""
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return out, ProcTime(label, time.perf_counter() - t0)


def staged_timings(state, left, right, rig, cfg):
    """Reference-style per-stage breakdown of one VO frame.

    Returns (records, outputs-ish dict).  Stage labels follow the
    reference's WindowMatcher/live_stereo naming: Detection,
    Description+Stereo, Triangulation, KNN_Match, MotionExtraction.
    """
    import jax.numpy as jnp

    from front_end_tpu.ops import brief as brief_mod
    from front_end_tpu.ops import grid as grid_mod
    from front_end_tpu.ops import match as match_mod
    from front_end_tpu.pipeline import vo as vo_mod
    from front_end_tpu.types import Descriptors

    records = []
    det_pair, r0 = timed(
        "Detection",
        jax.jit(lambda l, r, tl, tr: grid_mod.detect_pair(
            l, r, tl, tr, cfg.grid)),
        left, right, state.thresholds_l, state.thresholds_r)
    records.append(r0)

    feats, r1 = timed(
        "Description+Stereo",
        jax.jit(lambda l, r, tl, tr: vo_mod._extract_frame(
            l, r, tl, tr, rig, cfg)[0]),
        left, right, state.thresholds_l, state.thresholds_r)
    records.append(r1)

    tm, r2 = timed(
        "KNN_Match",
        jax.jit(lambda c, p: match_mod.interframe_match(
            c.kps, Descriptors(bits=c.bits), p.kps,
            Descriptors(bits=p.bits), box=cfg.track_box,
            ratio=cfg.lowe_ratio)),
        feats, state.prev)
    records.append(r2)

    (H, stats), r3 = timed(
        "MotionExtraction",
        jax.jit(lambda k, c, p: vo_mod._estimate_motion(k, c, p, rig, cfg)),
        jax.random.PRNGKey(0), feats, state.prev)
    records.append(r3)
    return records, {"features": feats, "tracks": tm, "motion": H,
                     "stats": stats}
