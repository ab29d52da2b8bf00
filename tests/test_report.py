"""Reporting layer tests — `analysis/report.py` and `analysis/explore.py`
(the `bin/result_ONE..FOUR` + `bin/exploreFeatures` capability) actually
run end-to-end and produce the promised artifacts.
"""
import os

import numpy as np
import pytest

from front_end_tpu.analysis import report as report_mod
from front_end_tpu.pipeline.telemetry import (ProcTime, TelemetryLog,
                                              load_log, save_log)


def _frames(n=4, h=96, w=128, seed=3):
    rs = np.random.RandomState(seed)
    big = np.full((h, w + 2 * n + 16), 128.0, np.float32)
    for _ in range(160):
        y, x = rs.randint(4, h - 12), rs.randint(4, big.shape[1] - 12)
        s = rs.randint(3, 10)
        big[y:y + s, x:x + s] = rs.uniform(20, 235)
    big = np.clip(np.round(big + rs.normal(0, 2.0, big.shape)),
                  0, 255).astype(np.float32)
    lefts = np.stack([big[:, 2 * t:2 * t + w] for t in range(n)])
    rights = np.stack([big[:, 2 * t + 8:2 * t + 8 + w] for t in range(n)])
    return lefts, rights


def _fake_study():
    rs = np.random.RandomState(0)
    conds = {}
    for curve in (100, 500):
        for noise in (0.25, 1.0):
            for frac in (0.0, 0.1):
                conds[(curve, noise, frac)] = {
                    "rot_err_deg": rs.uniform(0.01, 1.0, 16),
                    "trans_err_m": rs.uniform(1e-4, 0.01, 16)}
    return {"PCL": {"medium": conds}, "BA": {"medium": dict(conds)}}


class TestReport:
    def test_generate_report_end_to_end(self, tmp_path):
        lefts, rights = _frames()
        path = report_mod.generate_report(
            None, str(tmp_path), frames=(lefts, rights),
            with_timings=False)
        assert os.path.basename(path) == "REPORT.md"
        txt = open(path).read()
        assert "## Detection" in txt
        assert os.path.exists(tmp_path / "detect_sweep.png")
        assert os.path.exists(tmp_path / "setpoint_tracking.png")
        # every figure referenced in the markdown exists on disk
        for line in txt.splitlines():
            if line.startswith("!["):
                fname = line[line.index("(") + 1:line.index(")")]
                assert (tmp_path / fname).exists(), fname

    def test_study_sections(self, tmp_path):
        study = _fake_study()
        figs = report_mod.plot_method_comparison(study, str(tmp_path))
        assert figs and all(os.path.exists(p) for p in figs)
        figs2 = report_mod.plot_operating_curves(study, str(tmp_path))
        assert figs2 and all(os.path.exists(p) for p in figs2)
        table = report_mod._study_table(study)
        # header + separator + one row per (method, speed, condition)
        assert len(table) == 2 + 2 * 8
        assert table[0].startswith("| method |")

    def test_descriptor_timing_table_rows(self):
        lefts, rights = _frames(n=1, h=128, w=160)
        rows = report_mod.descriptor_timing_table(lefts[0], rights[0],
                                                  repeats=1)
        names = {r["config"] for r in rows}
        # the reference's benchmarked configs (bin/result_ONE:24-25)
        assert {"BRIEF_16", "BRIEF_64", "SURF", "SURF_EXT",
                "FREAK", "ORB"} <= names
        for r in rows:
            assert r["ms"] > 0 and r["dims"] > 0

    def test_recorded_run_roundtrip_and_plots(self, tmp_path):
        log = TelemetryLog()
        rs = np.random.RandomState(1)
        for t in range(30):
            log.add_frame([ProcTime("frame", float(rs.uniform(0.003,
                                                              0.02)))])
            log.count("n_stereo", 400 + 10 * t)
            log.count("n_inliers", 300 + 5 * t)
        rec = str(tmp_path / "run.npz")
        save_log(rec, log, meta={"platform": "TPU v5 lite0"})
        stages, counters, meta = load_log(rec)
        assert stages["frame"].shape == (30,)
        np.testing.assert_allclose(counters["n_stereo"][-1], 690)
        assert meta["platform"] == "TPU v5 lite0"

        figs = report_mod.plot_recorded_run(rec, str(tmp_path))
        assert len(figs) == 2 and all(os.path.exists(p) for p in figs)

    def test_report_includes_recordings(self, tmp_path):
        log = TelemetryLog()
        log.add_frame([ProcTime("frame", 0.01)])
        log.count("n_stereo", 100)
        rec = str(tmp_path / "run.npz")
        save_log(rec, log, meta={"platform": "cpu-host"})
        lefts, rights = _frames()
        path = report_mod.generate_report(
            None, str(tmp_path), frames=(lefts, rights),
            with_timings=False, records=[rec])
        txt = open(path).read()
        assert "Recorded run" in txt
        assert os.path.exists(tmp_path / "recorded_run_frame_time.png")

    def test_platform_comparison_figures(self, tmp_path):
        """The i7-vs-TK1 analogue (`bin/result_ONE:60-91`): two
        recordings from different backends overlay in one frame-time
        chart + a throughput bar chart, and generate_report adds the
        comparison section when given >= 2 recordings."""
        recs = []
        for name, plat, dt in (("tpu", "TPU v5 lite0", 0.003),
                               ("cpu", "cpu-host", 0.05)):
            log = TelemetryLog()
            for t in range(20):
                log.add_frame([ProcTime("frame", dt * (1 + 0.1 * (t % 3)))])
                log.count("n_stereo", 400)
            rec = str(tmp_path / f"{name}.npz")
            save_log(rec, log, meta={"platform": plat})
            recs.append(rec)

        figs = report_mod.plot_recorded_comparison(recs, str(tmp_path))
        assert len(figs) == 2 and all(os.path.exists(p) for p in figs)
        assert os.path.exists(tmp_path / "platform_frame_time.png")
        assert os.path.exists(tmp_path / "platform_fps.png")

        lefts, rights = _frames()
        path = report_mod.generate_report(
            None, str(tmp_path / "rep"), frames=(lefts, rights),
            with_timings=False, records=recs)
        txt = open(path).read()
        assert "Platform comparison" in txt
        # per-record figures must not collide (stem-prefixed names) —
        # including the counters chart: an unprefixed name made the
        # second record silently overwrite the first's counters and the
        # report embed the wrong platform's data under both sections
        assert os.path.exists(tmp_path / "rep" / "recorded_tpu_frame_time.png")
        assert os.path.exists(tmp_path / "rep" / "recorded_cpu_frame_time.png")
        assert os.path.exists(tmp_path / "rep" / "recorded_tpu_counters.png")
        assert os.path.exists(tmp_path / "rep" / "recorded_cpu_counters.png")


class TestExplore:
    def test_explore_features_artifact(self, tmp_path):
        from front_end_tpu.analysis import explore as explore_mod

        lefts, _ = _frames(n=2)
        # write a PGM the explorer can load
        img_path = str(tmp_path / "probe.pgm")
        with open(img_path, "wb") as f:
            img = lefts[0].astype(np.uint8)
            f.write(b"P5\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
            f.write(img.tobytes())
        out = str(tmp_path / "explore")
        explore_mod.explore_features(family="FAST", out=out,
                                     image=img_path, n_frames=2, top=4)
        assert os.path.exists(os.path.join(out, "INDEX.md"))
        pngs = [f for f in os.listdir(out) if f.endswith(".png")]
        assert len(pngs) >= 1
