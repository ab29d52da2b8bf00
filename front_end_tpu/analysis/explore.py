"""Parameter exploration — the `bin/exploreFeatures` capability, batch-mode.

The reference's explorer (`/root/reference/bin/exploreFeatures:12-194`) is
an interactive OpenCV-trackbar UI: pick a detector family, drag its
parameters, watch keypoints drawn over ~100 bag frames, press keys to
detect/describe/draw.  A zero-display TPU environment gets the batch
equivalent with the same outcome — *see how every parameter combination
behaves on real frames*:

- sweep the family's FULL parameter grid (the stable-ID tables of
  `features.py`) over a handful of frames through the batched sweep
  service (one response map per structural group);
- rank combinations by mean detection count;
- render keypoint overlays for a spread of ranked combinations (the
  visual the trackbars gave) plus a count-vs-param summary figure;
- write an index markdown listing every combination's counts/timing so
  the "drag the slider" question — what does parameter X do? — is
  answered by a column scan.
"""
from __future__ import annotations

import os

import numpy as np

from front_end_tpu.analysis.report import CAT, INK, INK_MUT, _save, _style


def _frames(image: str | None, n_frames: int):
    if image:
        from front_end_tpu.io.kitti import _read_image
        img = _read_image(image)
        return [np.asarray(img)] * 1
    from bench import make_sequence
    L, _ = make_sequence(max(n_frames, 1))
    return [np.asarray(f) for f in L]


def explore_features(*, family: str = "FAST", out: str,
                     image: str | None = None, n_frames: int = 4,
                     top: int = 12) -> str:
    """Sweep `family`'s whole grid over frames; write overlays + index."""
    import jax.numpy as jnp

    from front_end_tpu import features as features_mod
    from front_end_tpu import services
    from front_end_tpu.types import Keypoints
    from front_end_tpu.viz import draw

    os.makedirs(out, exist_ok=True)
    frames = _frames(image, n_frames)

    table = features_mod.detector_table()
    ids = features_mod.ids_for(family, table)
    if not ids:
        raise SystemExit(f"unknown family {family!r}; known: "
                         f"{sorted({v['Name'] for v in table.values()})}")

    # ---- sweep the grid over the frames (batched service) -------------
    per_id = {i: [] for i in ids}
    times = {}
    for f in frames:
        res = services.single_image_detection(ids, f, f)
        for r in res:
            if not r.get("supported"):
                per_id.pop(r["detID"], None)
                continue
            per_id[r["detID"]].append(r["leftFeatures"]["nPoints"])
            times[r["detID"]] = r["processingTime"][0]["seconds"]
    ranked = sorted(per_id, key=lambda i: -np.mean(per_id[i]))

    # ---- overlays for a spread of ranked combinations ------------------
    pick = ranked[:: max(len(ranked) // max(top, 1), 1)][:top]
    overlay_rows = []
    for det_id in pick:
        fn, ok = features_mod.make_detector(table[det_id])
        if not ok:
            continue
        smap = np.asarray(fn(jnp.asarray(frames[0], jnp.float32)))
        ys, xs = np.nonzero(smap > 0)
        k = min(len(xs), 2048)
        sel = np.argsort(-smap[ys, xs])[:k]
        kps = Keypoints(
            xy=jnp.asarray(np.stack([xs[sel], ys[sel]], -1), jnp.float32),
            score=jnp.asarray(smap[ys[sel], xs[sel]]),
            angle=jnp.zeros((k,), jnp.float32),
            valid=jnp.ones((k,), bool))
        img = np.asarray(draw.draw_keypoints(frames[0], kps))
        path = os.path.join(out, f"{det_id}.png")
        _imwrite(path, img)
        overlay_rows.append((det_id, k, path))

    # ---- count-vs-parameter summary figure -----------------------------
    fig_path = _summary_figure(family, table, per_id, out)

    # ---- index ---------------------------------------------------------
    lines = [f"# exploreFeatures — {family}", "",
             f"{len(ids)} parameter combinations x {len(frames)} frames "
             f"(`bin/exploreFeatures` batch equivalent).", "",
             f"![summary]({os.path.basename(fig_path)})", "",
             "| rank | ID | params | mean kp | ms |", "|---|---|---|---|---|"]
    for rank, det_id in enumerate(ranked):
        p = table[det_id]["Param"]
        ptxt = ", ".join(f"{k}={v}" for k, v in p.items())
        lines.append(f"| {rank} | {det_id} | {ptxt} | "
                     f"{np.mean(per_id[det_id]):.0f} | "
                     f"{times.get(det_id, 0.0)*1e3:.2f} |")
    lines += ["", "## Overlays", ""]
    lines += [f"![{d}]({os.path.basename(p)}) `{d}` ({k} kp)"
              for d, k, p in overlay_rows]
    index = os.path.join(out, "INDEX.md")
    with open(index, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"explored {len(ids)} {family} combinations -> {index}")
    return index


def _imwrite(path: str, img: np.ndarray):
    import matplotlib.pyplot as plt
    plt.imsave(path, np.clip(img, 0, 255).astype(np.uint8))


def _summary_figure(family, table, per_id, out) -> str:
    """Mean count vs the family's primary threshold parameter, one line
    per secondary structural variant (count capped at 6 lines; the rest
    fold into the index table — never a generated 9th hue)."""
    import matplotlib.pyplot as plt

    prim = {"FAST": "threshold", "SURF": "hessian_threshold",
            "BRISK": "threshold", "AKAZE": "threshold",
            "ORB": "fast_threshold"}.get(family)
    groups: dict = {}
    for det_id, counts in per_id.items():
        p = dict(table[det_id]["Param"])
        x = p.pop(prim, None)
        key = ", ".join(f"{k}={v}" for k, v in sorted(p.items()))
        if x is not None:
            groups.setdefault(key, []).append((float(x), np.mean(counts)))

    fig, ax = plt.subplots(figsize=(5.2, 3.4))
    shown = sorted(groups)[:6]
    for i, key in enumerate(shown):
        pts = sorted(groups[key])
        xs, ys = zip(*pts)
        ax.plot(xs, ys, color=CAT[i % len(CAT)], linewidth=2,
                label=key if len(key) < 48 else key[:45] + "…", zorder=3)
    _style(ax, title=f"{family}: detections vs {prim}",
           xlabel=prim, ylabel="mean keypoints")
    if len(shown) > 1:
        ax.legend(frameon=False, fontsize=6, labelcolor=INK)
    if len(groups) > len(shown):
        ax.annotate(f"(+{len(groups)-len(shown)} more variants in table)",
                    (0.98, 0.02), xycoords="axes fraction", ha="right",
                    fontsize=7, color=INK_MUT)
    return _save(fig, os.path.join(out, f"summary_{family}.png"))
