"""Benchmark / study report generation — the `bin/result_*` capability.

Renders the framework's recorded artifacts into PNG figures + one
markdown report, replacing the reference's four plot scripts and the
dead operating-curve analysis:

- operating curves (rot/trans error vs noise x outliers x curve) over an
  `analysis.sweeps` study directory — `/root/reference/src/front_end/
  analysis.py:383-557` (`getOperatingCurves`, dead code there) and the
  study protocol of `bin/extractMotion`;
- detections-vs-threshold sweep with the reference's set-point lines —
  `bin/result_ONE:60-91` / `bin/result_FOUR:43-73` (750/1500/3000/5000
  gridlines);
- adaptive grid set-point tracking over a live sequence —
  `bin/result_FOUR:43-73`;
- per-descriptor description+matching timing — `bin/result_TWO:43-103`;
- stereo match counts per descriptor — `bin/result_THREE:31-53`.

All figures follow one visual system: fixed categorical series order
(methods/families keep their hue across every figure), a single-hue
sequential ramp for magnitude (outlier fraction), one axis per chart,
recessive grids, direct labels where series are few.
"""
from __future__ import annotations

import os
import time

import numpy as np

# Fixed categorical slot order (validated reference palette) — an entity
# keeps its hue in every figure: slot by first appearance in METHODS /
# families, never re-assigned when a filter drops series.
CAT = ("#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4", "#008300")
# Single-hue sequential ramp (light -> dark) for ordered magnitude
# (outlier fraction, noise level).
SEQ = ("#cde2fb", "#9ec5f4", "#6da7ec", "#3987e5", "#256abf", "#184f95",
       "#0d366b")
INK = "#1a1a19"
INK_MUT = "#6b6a63"
GRID = "#e6e5de"

METHOD_SLOTS = {"PCL": 0, "Nister": 1, "BA": 2, "WindowBA": 3}


def _style(ax, title=None, xlabel=None, ylabel=None):
    ax.grid(True, color=GRID, linewidth=0.8, zorder=0)
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(INK_MUT)
    ax.tick_params(colors=INK_MUT, labelcolor=INK)
    if title:
        ax.set_title(title, color=INK, fontsize=11, loc="left")
    if xlabel:
        ax.set_xlabel(xlabel, color=INK, fontsize=9)
    if ylabel:
        ax.set_ylabel(ylabel, color=INK, fontsize=9)


def _seq_color(i, n):
    """Ramp step for item i of n (avoid the near-white first step)."""
    idx = 1 + round((len(SEQ) - 2) * (i / max(n - 1, 1)))
    return SEQ[idx]


def _save(fig, path):
    fig.savefig(path, dpi=130, bbox_inches="tight", facecolor="white")
    import matplotlib.pyplot as plt
    plt.close(fig)
    return path


# ---------------------------------------------------------------------------
# operating curves (study directory -> figures)
# ---------------------------------------------------------------------------

def plot_operating_curves(study: dict, out_dir: str, *,
                          stat: str = "rot_err_deg", speed: str | None = None
                          ) -> list[str]:
    """Per method: error vs noise, one line per outlier fraction (sequential
    ramp), faceted by landmark-count curve.  `study` = sweeps.load_study."""
    import matplotlib.pyplot as plt

    unit = "deg" if "rot" in stat else "m"
    paths = []
    for method, per_speed in study.items():
        speeds = [speed] if speed else sorted(per_speed)
        for sp in speeds:
            conds = per_speed.get(sp, {})
            if not conds:
                continue
            curves = sorted({k[0] for k in conds})
            fracs = sorted({k[2] for k in conds})
            fig, axes = plt.subplots(
                1, len(curves), figsize=(3.3 * len(curves), 3.0),
                sharey=True, squeeze=False)
            for ci, curve in enumerate(curves):
                ax = axes[0][ci]
                for fi, frac in enumerate(fracs):
                    pts = sorted((k[1], np.median(v[stat]))
                                 for k, v in conds.items()
                                 if k[0] == curve and k[2] == frac
                                 and stat in v)
                    if not pts:
                        continue
                    xs, ys = zip(*pts)
                    ax.plot(xs, ys, color=_seq_color(fi, len(fracs)),
                            linewidth=2, marker="o", markersize=4,
                            label=f"{frac*100:.0f}% outliers", zorder=3)
                _style(ax, title=f"{curve} landmarks",
                       xlabel="pixel noise σ (px)",
                       ylabel=f"median {stat} ({unit})" if ci == 0 else None)
            axes[0][-1].legend(frameon=False, fontsize=7,
                               labelcolor=INK)
            fig.suptitle(f"{method} — {sp} motion", color=INK, fontsize=12,
                         x=0.01, ha="left")
            p = os.path.join(out_dir,
                             f"curves_{method}_{sp}_{stat.split('_')[0]}.png")
            paths.append(_save(fig, p))
    return paths


def plot_method_comparison(study: dict, out_dir: str, *,
                           stat: str = "rot_err_deg",
                           outlier_frac: float = 0.0) -> list[str]:
    """All methods on one axis: error vs noise at a fixed outlier level,
    at the largest common landmark curve.  Methods keep their categorical
    slot from METHOD_SLOTS in every figure."""
    import matplotlib.pyplot as plt

    unit = "deg" if "rot" in stat else "m"
    speeds = sorted({sp for m in study.values() for sp in m})
    paths = []
    for sp in speeds:
        fig, ax = plt.subplots(figsize=(4.6, 3.2))
        plotted = 0
        for method, per_speed in sorted(study.items()):
            conds = per_speed.get(sp, {})
            curves = sorted({k[0] for k in conds})
            if not curves:
                continue
            curve = curves[-1]
            pts = sorted((k[1], np.median(v[stat]))
                         for k, v in conds.items()
                         if k[0] == curve and k[2] == outlier_frac
                         and stat in v)
            if not pts:
                continue
            xs, ys = zip(*pts)
            c = CAT[METHOD_SLOTS.get(method, 5)]
            ax.plot(xs, ys, color=c, linewidth=2, marker="o",
                    markersize=4, label=method, zorder=3)
            ax.annotate(method, (xs[-1], ys[-1]), textcoords="offset points",
                        xytext=(5, 0), fontsize=8, color=INK)
            plotted += 1
        if not plotted:
            plt.close(fig)
            continue
        _style(ax, title=f"Estimator degradation — {sp} motion, "
                         f"{outlier_frac*100:.0f}% outliers",
               xlabel="pixel noise σ (px)",
               ylabel=f"median {stat} ({unit})")
        if plotted > 1:     # single series: the title names it
            ax.legend(frameon=False, fontsize=8, labelcolor=INK)
        p = os.path.join(out_dir, f"methods_{sp}_{stat.split('_')[0]}.png")
        paths.append(_save(fig, p))
    return paths


# ---------------------------------------------------------------------------
# live plots (run the framework, render what result_ONE..FOUR recorded)
# ---------------------------------------------------------------------------

SET_POINTS = (750, 1500, 3000, 5000)        # bin/result_TWO:22, result_FOUR


def plot_detection_sweep(left, right, out_dir: str,
                         thresholds=tuple(range(5, 60, 5))) -> str:
    """Detections vs FAST threshold per circle type, with the reference's
    set-point gridlines (`bin/result_FOUR:69-71`)."""
    import matplotlib.pyplot as plt

    from front_end_tpu import services

    fig, ax = plt.subplots(figsize=(4.8, 3.4))
    for i, d_type in enumerate(("5_8", "7_12", "9_16")):
        ids = [{"Name": "FAST",
                "Param": {"threshold": t, "d_type": d_type,
                          "non_maximum_suppression": True}}
               for t in thresholds]
        res = services.single_image_detection(ids, left, right)
        counts = [r["leftFeatures"]["nPoints"] for r in res]
        ax.plot(thresholds, counts, color=CAT[i], linewidth=2, marker="o",
                markersize=4, label=f"FAST {d_type}", zorder=3)
    for spt in SET_POINTS:
        ax.axhline(spt, color=INK_MUT, linewidth=0.8, linestyle="--",
                   zorder=1)
        ax.annotate(str(spt), (thresholds[-1], spt), fontsize=7,
                    color=INK_MUT, va="bottom", ha="right")
    _style(ax, title="Detections vs threshold (NMS on)",
           xlabel="FAST threshold", ylabel="keypoints (left image)")
    ax.legend(frameon=False, fontsize=8, labelcolor=INK)
    return _save(fig, os.path.join(out_dir, "detect_sweep.png"))


def plot_setpoint_tracking(lefts, out_dir: str,
                           set_points=(1000, 3000, 5000)) -> str:
    """Adaptive grid controller convergence at several set-points over a
    live sequence — `bin/result_FOUR:43-73` with its reference lines."""
    import jax
    import jax.numpy as jnp
    import matplotlib.pyplot as plt

    from front_end_tpu.ops import grid as grid_mod

    fig, ax = plt.subplots(figsize=(4.8, 3.4))
    for i, spt in enumerate(set_points):
        cfg = grid_mod.GridConfig(set_point=spt, init_threshold=15.0)
        th = cfg.init_thresholds()
        step = jax.jit(lambda img, t: grid_mod.detect(img, t, cfg))
        counts = []
        for img in lefts:
            det = step(jnp.asarray(img, jnp.float32), th)
            th = det.thresholds
            counts.append(int(det.keypoints.count))
        ax.plot(range(len(counts)), counts, color=CAT[i], linewidth=2,
                label=f"set-point {spt}", zorder=3)
        ax.axhline(spt, color=CAT[i], linewidth=0.8, linestyle="--",
                   alpha=0.5, zorder=1)
    _style(ax, title="Adaptive grid set-point tracking",
           xlabel="frame", ylabel="detections")
    ax.legend(frameon=False, fontsize=8, labelcolor=INK)
    return _save(fig, os.path.join(out_dir, "setpoint_tracking.png"))


DESC_CONFIGS = (                      # bin/result_ONE:24-25 configurations
    ("BRIEF_16", {"Name": "BRIEF", "Param": {"bytes": 16,
                                             "use_orientation": 0}}),
    ("BRIEF_64", {"Name": "BRIEF", "Param": {"bytes": 64,
                                             "use_orientation": 0}}),
    ("SURF", {"Name": "SURF", "Param": {"extended": 0, "upright": 0}}),
    ("SURF_EXT", {"Name": "SURF", "Param": {"extended": 1, "upright": 0}}),
    ("FREAK", {"Name": "FREAK", "Param": {"pattern_scale": 1.0}}),
    ("ORB", {"Name": "ORB", "Param": {"bytes": 32}}),
)


def descriptor_timing_table(left, right, *, repeats: int = 3) -> list[dict]:
    """Time describe+match per benchmarked descriptor config on one stereo
    pair (the `result_TWO`/`result_THREE` measurement, on-device)."""
    import jax
    import jax.numpy as jnp

    from front_end_tpu import features as features_mod
    from front_end_tpu.ops import grid as grid_mod
    from front_end_tpu.ops import match as match_mod
    from front_end_tpu.types import Keypoints

    left = jnp.asarray(left, jnp.float32)
    right = jnp.asarray(right, jnp.float32)
    cfg = grid_mod.GridConfig()
    detl = grid_mod.detect(left, cfg.init_thresholds(), cfg)
    detr = grid_mod.detect(right, cfg.init_thresholds(), cfg)
    kl, kr = detl.keypoints, detr.keypoints

    rows = []
    for label, settings in DESC_CONFIGS:
        fn, ok = features_mod.make_descriptor(settings)
        if not ok:
            continue
        norm = settings.get("NormType",
                            "NORM_L2" if settings["Name"] == "SURF"
                            else "NORM_HAMMING")

        def run():
            dl = fn(left, kl.xy)
            dr = fn(right, kr.xy)
            m = match_mod.stereo_match_knn(
                kl, dl, kr, dr, epi_threshold=2.0, ratio=0.8,
                norm="l2" if norm == "NORM_L2" else "hamming")
            return dl, m

        jrun = jax.jit(run)
        dl, m = jrun()
        jax.block_until_ready(m.valid)
        t0 = time.perf_counter()
        for _ in range(repeats):
            dl, m = jrun()
        jax.block_until_ready(m.valid)
        dt = (time.perf_counter() - t0) / repeats
        rows.append({"config": label, "ms": dt * 1e3,
                     "dims": int(dl.bits.shape[-1]),
                     "matches": int(m.count)})
    return rows


def plot_descriptor_timing(rows: list[dict], out_dir: str) -> list[str]:
    """result_TWO (desc+match ms) and result_THREE (match counts) as two
    single-axis bar charts (never dual-axis)."""
    import matplotlib.pyplot as plt

    paths = []
    for key, title, fname in (
            ("ms", "Description + matching time", "descriptor_time.png"),
            ("matches", "Stereo matches", "descriptor_matches.png")):
        fig, ax = plt.subplots(figsize=(4.8, 2.8))
        names = [r["config"] for r in rows]
        vals = [r[key] for r in rows]
        ax.barh(range(len(rows)), vals, color=CAT[0], height=0.6, zorder=3)
        ax.set_yticks(range(len(rows)), names, fontsize=8, color=INK)
        ax.invert_yaxis()
        for i, v in enumerate(vals):
            ax.annotate(f"{v:.1f}" if key == "ms" else f"{v}", (v, i),
                        textcoords="offset points", xytext=(4, 0),
                        va="center", fontsize=8, color=INK)
        _style(ax, title=title,
               xlabel="ms / stereo pair" if key == "ms" else "matches")
        paths.append(_save(fig, os.path.join(out_dir, fname)))
    return paths


# ---------------------------------------------------------------------------
# recorded-run plots (plot FROM a recording, like result_ONE from bags)
# ---------------------------------------------------------------------------

FRAME_BUDGET_S = 1.0 / 15.0          # the reference camera budget line


def plot_recorded_run(record_path: str, out_dir: str) -> list[str]:
    """Render a `cli vo --record` telemetry stream: per-frame wall time
    with the 15 fps camera-budget gridline (`bin/result_ONE:69` plots
    recorded bags against 1000/15 ms), plus the counter series.  The
    platform label comes from the recording — recordings from different
    backends (TPU vs CPU host) can be rendered side by side, the i7-vs-
    Jetson comparison workflow."""
    import matplotlib.pyplot as plt

    from front_end_tpu.pipeline import telemetry

    stages, counters, meta = telemetry.load_log(record_path)
    plat = meta.get("platform", "device")
    stem = os.path.basename(record_path)
    for ext in (".npz",):
        if stem.endswith(ext):
            stem = stem[:-len(ext)]
    paths = []

    if "frame" in stages:
        ts = stages["frame"] * 1e3
        fig, ax = plt.subplots(figsize=(4.8, 3.0))
        ax.plot(range(len(ts)), ts, color=CAT[0], linewidth=1.5, zorder=3)
        ax.axhline(FRAME_BUDGET_S * 1e3, color=INK_MUT, linewidth=0.8,
                   linestyle="--", zorder=1)
        ax.annotate("15 fps budget", (0, FRAME_BUDGET_S * 1e3), fontsize=7,
                    color=INK_MUT, va="bottom")
        _style(ax, title=f"Recorded frame time — {plat}",
               xlabel="frame", ylabel="ms / frame")
        paths.append(_save(fig, os.path.join(
            out_dir, f"recorded_{stem}_frame_time.png")))

    series = [(k, v) for k, v in sorted(counters.items())
              if k.startswith("n_")]
    if series:
        fig, ax = plt.subplots(figsize=(4.8, 3.0))
        for i, (k, v) in enumerate(series):
            ax.plot(range(len(v)), v, color=CAT[i % len(CAT)],
                    linewidth=1.5, label=k, zorder=3)
        _style(ax, title=f"Recorded pipeline counters — {plat}",
               xlabel="frame", ylabel="count")
        ax.legend(frameon=False, fontsize=7, labelcolor=INK)
        paths.append(_save(fig, os.path.join(
            out_dir, f"recorded_{stem}_counters.png")))
    # non-count series (e.g. ba_rms_px) get their own axes — units differ
    others = [(k, v) for k, v in sorted(counters.items())
              if not k.startswith("n_")]
    for i, (k, v) in enumerate(others):
        fig, ax = plt.subplots(figsize=(4.8, 2.6))
        ax.plot(range(len(v)), v, color=CAT[(i + 1) % len(CAT)],
                linewidth=1.5, zorder=3)
        _style(ax, title=f"Recorded {k} — {plat}", xlabel="frame",
               ylabel=k)
        paths.append(_save(fig, os.path.join(
            out_dir, f"recorded_{stem}_{k}.png")))
    return paths


def plot_recorded_comparison(record_paths: list[str], out_dir: str,
                             labels: list[str] | None = None) -> list[str]:
    """The platform-comparison artifact: the SAME pipeline recorded on
    different backends plotted together — the reference's core
    experiment (i7 vs Jetson TK1, `bin/result_ONE:60-91` overlays both
    platforms' recorded frame times against the 15 fps camera budget).
    One frame-time chart and one median-fps bar chart; labels default to
    each recording's platform metadata."""
    import matplotlib.pyplot as plt

    from front_end_tpu.pipeline import telemetry

    loaded = []
    for i, rec in enumerate(record_paths):
        stages, counters, meta = telemetry.load_log(rec)
        lab = (labels[i] if labels and i < len(labels)
               else meta.get("platform", os.path.basename(rec)))
        loaded.append((lab, stages, counters))
    paths = []

    fig, ax = plt.subplots(figsize=(5.4, 3.2))
    for i, (lab, stages, _) in enumerate(loaded):
        if "frame" not in stages:
            continue
        ts = stages["frame"] * 1e3
        ax.plot(range(len(ts)), ts, color=CAT[i % len(CAT)],
                linewidth=1.5, label=lab, zorder=3)
    ax.axhline(FRAME_BUDGET_S * 1e3, color=INK_MUT, linewidth=0.8,
               linestyle="--", zorder=1)
    ax.annotate("15 fps budget", (0, FRAME_BUDGET_S * 1e3), fontsize=7,
                color=INK_MUT, va="bottom")
    ax.set_yscale("log")
    _style(ax, title="Recorded frame time by platform",
           xlabel="frame", ylabel="ms / frame (log)")
    ax.legend(frameon=False, fontsize=8, labelcolor=INK)
    paths.append(_save(fig, os.path.join(out_dir,
                                         "platform_frame_time.png")))

    fig, ax = plt.subplots(figsize=(4.8, 2.2))
    labs, fps = [], []
    for lab, stages, _ in loaded:
        if "frame" in stages and len(stages["frame"]):
            labs.append(lab)
            fps.append(1.0 / float(np.median(stages["frame"])))
    ax.barh(range(len(labs)), fps, color=CAT[0], height=0.55, zorder=3)
    ax.set_yticks(range(len(labs)), labs, fontsize=8, color=INK)
    ax.invert_yaxis()
    for i, v in enumerate(fps):
        ax.annotate(f"{v:.1f}", (v, i), textcoords="offset points",
                    xytext=(4, 0), va="center", fontsize=8, color=INK)
    _style(ax, title="Median throughput by platform",
           xlabel="frames / s")
    paths.append(_save(fig, os.path.join(out_dir, "platform_fps.png")))
    return paths


# ---------------------------------------------------------------------------
# the report
# ---------------------------------------------------------------------------

def _study_table(study: dict) -> list[str]:
    lines = ["| method | speed | landmarks | noise px | outliers | "
             "rot err (deg, med) | trans err (mm, med) |",
             "|---|---|---|---|---|---|---|"]
    for method in sorted(study):
        for sp in sorted(study[method]):
            for (curve, noise, frac), v in sorted(study[method][sp].items()):
                lines.append(
                    f"| {method} | {sp} | {curve} | {noise:g} | "
                    f"{frac*100:.0f}% | "
                    f"{np.median(v['rot_err_deg']):.4f} | "
                    f"{np.median(v['trans_err_m'])*1e3:.2f} |")
    return lines


def generate_report(study_dir: str | None, out_dir: str, *,
                    frames=None, with_timings: bool = True,
                    bench_json: str | None = None,
                    records: list[str] | None = None) -> str:
    """Render everything available into `out_dir` and write REPORT.md.

    study_dir: an `analysis.sweeps` output directory (or None to skip);
    frames: optional (lefts, rights) arrays for the live plots (falls
    back to the bench synthetic sequence); bench_json: a BENCH_r*.json /
    bench.py output line to inline; records: `cli vo --record` telemetry
    streams to render (the recorded-bag workflow).
    """
    os.makedirs(out_dir, exist_ok=True)
    sections = ["# front_end_tpu report",
                f"\nGenerated by `cli report` — the `bin/result_ONE..FOUR` "
                f"and operating-curve (`analysis.py:383-557`) capability.\n"]
    figs: list[str] = []

    if frames is None:
        from bench import make_sequence
        lefts, rights = make_sequence(12)
        lefts, rights = np.asarray(lefts), np.asarray(rights)
    else:
        lefts, rights = frames

    if study_dir and os.path.isdir(study_dir):
        from front_end_tpu.analysis import sweeps
        study = sweeps.load_study(study_dir)
        if study:
            sections.append("## Estimator operating curves\n")
            for stat in ("rot_err_deg", "trans_err_m"):
                figs += plot_method_comparison(study, out_dir, stat=stat)
                figs += plot_operating_curves(study, out_dir, stat=stat)
            sections += ["", "### Median errors per condition", ""]
            sections += _study_table(study)
            sections.append("")

    found_recs = []
    for rec in records or []:
        if not os.path.exists(rec) and os.path.exists(rec + ".npz"):
            rec = rec + ".npz"       # save_log appends the extension
        if os.path.exists(rec):
            found_recs.append(rec)
            sections.append(f"## Recorded run: `{os.path.basename(rec)}`\n")
            figs += plot_recorded_run(rec, out_dir)
    if len(found_recs) >= 2:
        sections.append("## Platform comparison\n\nThe same pipeline "
                        "recorded on each backend, overlaid — the "
                        "reference's i7-vs-Jetson experiment "
                        "(`bin/result_ONE:60-91`).\n")
        figs += plot_recorded_comparison(found_recs, out_dir)

    sections.append("## Detection\n")
    figs.append(plot_detection_sweep(lefts[0], rights[0], out_dir))
    figs.append(plot_setpoint_tracking(lefts, out_dir))

    if with_timings:
        sections.append("## Descriptor timing\n")
        rows = descriptor_timing_table(lefts[0], rights[0])
        figs += plot_descriptor_timing(rows, out_dir)
        sections += ["| config | dims | desc+match ms | matches |",
                     "|---|---|---|---|"]
        sections += [f"| {r['config']} | {r['dims']} | {r['ms']:.2f} | "
                     f"{r['matches']} |" for r in rows]
        sections.append("")

    if bench_json and os.path.exists(bench_json):
        with open(bench_json) as f:
            sections += ["## Headline bench\n", "```json",
                         f.read().strip(), "```", ""]

    sections.append("## Figures\n")
    sections += [f"![{os.path.basename(p)}]({os.path.basename(p)})"
                 for p in figs]

    path = os.path.join(out_dir, "REPORT.md")
    with open(path, "w") as f:
        f.write("\n".join(sections) + "\n")
    return path
