"""EuRoC MAV dataset loader (ASL folder layout, stereo grayscale).

    <root>/<seq>/mav0/cam0/data/*.png   (left)
    <root>/<seq>/mav0/cam1/data/*.png   (right)
    <root>/<seq>/mav0/cam0/sensor.yaml  (intrinsics)
    <root>/<seq>/mav0/state_groundtruth_estimate0/data.csv

EuRoC cameras are not rectified; this loader exposes the raw pair plus
the nominal intrinsics — the pipeline's rectified-rig assumption means a
pre-rectification step (or tolerance of the small stereo misalignment
via a wider epipolar gate) is the caller's choice, as in BASELINE.json
config 3.
"""
from __future__ import annotations

import csv
import os

import numpy as np

from front_end_tpu.geometry.camera import StereoRig
from front_end_tpu.io.kitti import _read_image


def load_rig(seq_dir: str) -> StereoRig:
    """Nominal EuRoC stereo rig (cam0 intrinsics, 11 cm baseline)."""
    path = os.path.join(seq_dir, "mav0", "cam0", "sensor.yaml")
    fx = fy = 458.654
    cx, cy = 367.215, 248.375
    w, h = 752, 480
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                if line.strip().startswith("intrinsics:"):
                    vals = line.split("[")[1].split("]")[0].split(",")
                    fx, fy, cx, cy = [float(v) for v in vals]
                if line.strip().startswith("resolution:"):
                    vals = line.split("[")[1].split("]")[0].split(",")
                    w, h = int(vals[0]), int(vals[1])
    return StereoRig.create(fx=fx, fy=fy, cx=cx, cy=cy, baseline=0.11,
                            width=w, height=h)


class EurocSequence:
    def __init__(self, root: str, seq: str = "MH_01_easy",
                 max_frames: int | None = None):
        self.seq_dir = os.path.join(root, seq)
        cam0 = os.path.join(self.seq_dir, "mav0", "cam0", "data")
        cam1 = os.path.join(self.seq_dir, "mav0", "cam1", "data")
        if not os.path.isdir(cam0):
            raise FileNotFoundError(f"EuRoC sequence not found at {cam0}")
        self.rig = load_rig(self.seq_dir)
        names0 = set(os.listdir(cam0))
        names1 = set(os.listdir(cam1))
        self.names = sorted(names0 & names1)
        if max_frames:
            self.names = self.names[:max_frames]
        self._cam0, self._cam1 = cam0, cam1

    def __len__(self):
        return len(self.names)

    def __getitem__(self, i):
        l = _read_image(os.path.join(self._cam0, self.names[i]))
        r = _read_image(os.path.join(self._cam1, self.names[i]))
        return l, r

    def ground_truth(self):
        path = os.path.join(self.seq_dir, "mav0",
                            "state_groundtruth_estimate0", "data.csv")
        ts, pos = [], []
        with open(path) as f:
            for row in csv.reader(f):
                if row[0].startswith("#"):
                    continue
                ts.append(int(row[0]))
                pos.append([float(row[1]), float(row[2]), float(row[3])])
        return np.asarray(ts), np.asarray(pos)
