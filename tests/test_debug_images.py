"""Live debug imagery from the RUNNING pipeline (`cli vo
--debug-images`): the reference publishes drawn stereo-match images and
anaglyph track overlays continuously while operating
(`/root/reference/src/front_end/features.py:752-760`,
`algorithm.py:1198-1202`, `visualize.py:7-74`); this proves the TPU
pipeline's equivalent live-inspection surface end-to-end — CLI flag ->
jitted step's own uv4/track state -> rendered files on disk."""
import os

import numpy as np
import pytest

from front_end_tpu import cli

from test_kitti_format import _make_kitti_root


@pytest.mark.slow
def test_cli_vo_writes_debug_images(tmp_path):
    root, gt = _make_kitti_root(tmp_path / "kitti", n_frames=8)
    dbg = str(tmp_path / "dbg")
    cli.main(["vo", "--kitti", root, "--seq", "07", "--frames", "8",
              "--debug-images", dbg, "--debug-every", "4"])

    files = sorted(os.listdir(dbg))
    matches = [f for f in files if f.startswith("match_")]
    tracks = [f for f in files if f.startswith("tracks_")]
    assert len(matches) == 2 and len(tracks) == 2, files  # frames 0, 4

    import matplotlib.pyplot as plt
    m = plt.imread(os.path.join(dbg, matches[-1]))
    t = plt.imread(os.path.join(dbg, tracks[-1]))
    # side-by-side stereo canvas is twice the frame width
    assert m.shape[0] == 192 and m.shape[1] == 512, m.shape
    assert t.shape[0] == 192 and t.shape[1] == 256, t.shape
    # match overlay must contain drawn green match lines
    g = (m[..., 1] > 0.9) & (m[..., 0] < 0.1) & (m[..., 2] < 0.1)
    assert g.sum() > 200, g.sum()
    # the anaglyph track canvas: red/cyan split means channel 0 differs
    # from channel 1 over most of the image (true stereo disparity)
    assert np.mean(np.abs(t[..., 0] - t[..., 1]) > 1e-3) > 0.1
    # and frame 4 (tracking established) must draw green inlier tracks
    gt_ = (t[..., 1] > 0.9) & (t[..., 0] < 0.1) & (t[..., 2] < 0.1)
    assert gt_.sum() > 50, gt_.sum()


@pytest.mark.slow
def test_cli_vo_debug_images_windowed(tmp_path):
    root, gt = _make_kitti_root(tmp_path / "kitti", n_frames=6)
    dbg = str(tmp_path / "dbgw")
    cli.main(["vo", "--kitti", root, "--seq", "07", "--frames", "6",
              "--window", "--debug-images", dbg, "--debug-every", "5"])
    files = sorted(os.listdir(dbg))
    assert any(f.startswith("match_") for f in files), files
    assert any(f.startswith("tracks_") for f in files), files
