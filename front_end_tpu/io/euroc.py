"""EuRoC MAV dataset loader (ASL folder layout, stereo grayscale).

    <root>/<seq>/mav0/cam0/data/*.png   (left)
    <root>/<seq>/mav0/cam1/data/*.png   (right)
    <root>/<seq>/mav0/cam0/sensor.yaml  (intrinsics, radtan distortion,
                                         T_BS extrinsics)
    <root>/<seq>/mav0/state_groundtruth_estimate0/data.csv

EuRoC cameras are raw (radial-tangential distortion, non-coplanar); with
`rectify=True` (the default) the loader builds a `StereoRectifier` from
both cameras' sensor.yaml calibration once and every frame pair is
undistorted + row-aligned on device before entering the pipeline — the
step the reference outsourced to its `bumblebee` calibration server
(`/root/reference/src/StereoCamera.cpp:10-21` getOffset/getQ services).
BASELINE config 3 (EuRoC MH_01) runs through the same `StereoRig`
pipeline as KITTI.
"""
from __future__ import annotations

import csv
import os

import numpy as np

from front_end_tpu.geometry.camera import StereoRig
from front_end_tpu.io.kitti import _read_image

# nominal cam0 values (used when sensor.yaml is absent)
_NOMINAL = dict(intrinsics=(458.654, 457.296, 367.215, 248.375),
                resolution=(752, 480),
                distortion=(-0.28340811, 0.07395907, 0.00019359,
                            1.76187114e-05))


def read_sensor_yaml(path: str) -> dict:
    """Parse one cam's sensor.yaml -> {K (3,3), D (4,), T_BS (4,4),
    size (W, H)}.  Falls back to nominal cam0 values if missing."""
    cal = dict(_NOMINAL)
    T = np.eye(4)
    if os.path.exists(path):
        import yaml
        with open(path) as f:
            y = yaml.safe_load(f)
        cal["intrinsics"] = tuple(y["intrinsics"])
        cal["resolution"] = tuple(y["resolution"])
        cal["distortion"] = tuple(y["distortion_coefficients"])
        if "T_BS" in y:
            data = y["T_BS"]["data"] if isinstance(y["T_BS"], dict) \
                else y["T_BS"]
            T = np.asarray(data, np.float64).reshape(4, 4)
    fx, fy, cx, cy = cal["intrinsics"]
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    return {"K": K, "D": np.asarray(cal["distortion"]), "T_BS": T,
            "size": tuple(cal["resolution"])}


def load_rig(seq_dir: str) -> StereoRig:
    """Nominal (unrectified) EuRoC stereo rig from cam0 intrinsics —
    kept for callers that skip rectification."""
    cal = read_sensor_yaml(
        os.path.join(seq_dir, "mav0", "cam0", "sensor.yaml"))
    w, h = cal["size"]
    return StereoRig.create(fx=float(cal["K"][0, 0]),
                            fy=float(cal["K"][1, 1]),
                            cx=float(cal["K"][0, 2]),
                            cy=float(cal["K"][1, 2]),
                            baseline=0.11, width=w, height=h)


def build_rectifier(seq_dir: str):
    """StereoRectifier from cam0+cam1 sensor.yaml (T_cam1_cam0 from the
    body-frame extrinsics)."""
    from front_end_tpu.io.rectify import StereoRectifier

    c0 = read_sensor_yaml(os.path.join(seq_dir, "mav0", "cam0",
                                       "sensor.yaml"))
    c1 = read_sensor_yaml(os.path.join(seq_dir, "mav0", "cam1",
                                       "sensor.yaml"))
    if np.allclose(c1["T_BS"], np.eye(4)):
        # missing cam1 extrinsics: nominal 11 cm x-baseline
        T01 = np.eye(4)
        T01[0, 3] = -0.11
    else:
        T01 = np.linalg.inv(c1["T_BS"]) @ c0["T_BS"]   # cam0 -> cam1
    return StereoRectifier(c0["K"], c0["D"], c1["K"], c1["D"],
                           T01[:3, :3], T01[:3, 3], c0["size"])


class EurocSequence:
    def __init__(self, root: str, seq: str = "MH_01_easy",
                 max_frames: int | None = None, rectify: bool = True):
        self.seq_dir = os.path.join(root, seq)
        cam0 = os.path.join(self.seq_dir, "mav0", "cam0", "data")
        cam1 = os.path.join(self.seq_dir, "mav0", "cam1", "data")
        if not os.path.isdir(cam0):
            raise FileNotFoundError(f"EuRoC sequence not found at {cam0}")
        self.rectifier = build_rectifier(self.seq_dir) if rectify else None
        self.rig = (self.rectifier.rig() if self.rectifier
                    else load_rig(self.seq_dir))
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
        if self.rectifier is not None:
            l, r = self.rectifier(l, r)
        return l, r

    def frames(self):
        for i in range(len(self)):
            yield self[i]

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
