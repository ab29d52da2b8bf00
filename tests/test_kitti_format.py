"""KITTI-format ingestion end-to-end on a synthesized dataset.

There is no KITTI data on the build machine, so the loader and the
`cli vo --kitti` path had never demonstrably run.  This test WRITES a
KITTI-layout dataset (sequences/<seq>/image_{0,1}/*.pgm + calib.txt +
times.txt + poses/<seq>.txt) from the rendered-world corridor
(`sim/render.py`), then drives `KittiSequence` -> VO -> ATE-vs-poses —
the exact workflow a user with real KITTI data runs.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from front_end_tpu.eval import metrics
from front_end_tpu.geometry.camera import StereoRig
from front_end_tpu.io.kitti import KittiSequence
from front_end_tpu.ops import grid
from front_end_tpu.pipeline import vo
from front_end_tpu.sim import render


def _write_pgm(path, img):
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        f.write(np.asarray(np.clip(img, 0, 255), np.uint8).tobytes())


def _make_kitti_root(tmp_path, n_frames=12):
    rng = np.random.RandomState(5)
    rig = StereoRig.create(fx=200.0, cx=127.5, cy=95.5, baseline=0.3,
                           width=256, height=192)
    scene = render.corridor_scene(rng, tex_size=256)
    gt = render.corridor_trajectory(n_frames)
    lefts, rights = render.render_stereo_sequence(scene, rig, gt)

    seq_dir = tmp_path / "sequences" / "07"
    (seq_dir / "image_0").mkdir(parents=True)
    (seq_dir / "image_1").mkdir(parents=True)
    for i in range(n_frames):
        _write_pgm(seq_dir / "image_0" / f"{i:06d}.pgm", lefts[i])
        _write_pgm(seq_dir / "image_1" / f"{i:06d}.pgm", rights[i])
    fx, cx, cy, b = 200.0, 127.5, 95.5, 0.3
    P0 = f"P0: {fx} 0 {cx} 0 0 {fx} {cy} 0 0 0 1 0\n"
    P1 = f"P1: {fx} 0 {cx} {-fx*b} 0 {fx} {cy} 0 0 0 1 0\n"
    (seq_dir / "calib.txt").write_text(P0 + P1)
    (seq_dir / "times.txt").write_text(
        "".join(f"{0.1*i:.6f}\n" for i in range(n_frames)))
    (tmp_path / "poses").mkdir()
    rows = gt[:, :3, :].reshape(n_frames, 12)
    np.savetxt(tmp_path / "poses" / "07.txt", rows)
    return str(tmp_path), gt


@pytest.mark.slow
def test_kitti_sequence_vo_end_to_end(tmp_path):
    root, gt = _make_kitti_root(tmp_path)
    seq = KittiSequence(root, "07", max_frames=12)
    assert len(seq) == 12
    assert seq.poses is not None and seq.poses.shape == (12, 4, 4)
    rig = seq.rig
    assert abs(float(rig.fx) - 200.0) < 1e-6
    assert abs(float(rig.baseline) - 0.3) < 1e-6
    assert rig.width == 256 and rig.height == 192

    cfg = vo.VOConfig(
        grid=grid.GridConfig(grid_rows=2, grid_cols=3, cell_capacity=128,
                             set_point=700, init_threshold=12.0),
        desc_bytes=32, ransac_hyps=192, ransac_threshold=0.12,
        max_disparity=60.0, min_track_inliers=10)
    state = vo.init_state(rig, cfg)
    step = jax.jit(lambda s, l, r: vo.vo_step(s, l, r, rig, cfg))
    poses = []
    for l, r in seq.frames():
        state, out = step(state, jnp.asarray(l), jnp.asarray(r))
        poses.append(np.asarray(out.pose))
    poses = np.stack(poses)

    path_len = np.sum(np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1))
    ate = metrics.ate_rmse(poses[:, :3, 3], seq.poses[:, :3, 3])
    assert ate < 0.05 * path_len, (ate, path_len)
