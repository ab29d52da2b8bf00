"""KITTI odometry loader (grayscale stereo).

The reference consumed its data through the external `dataset` ROS
package (bag unpacking); the TPU framework reads KITTI's on-disk layout
directly:

    <root>/sequences/<seq>/image_0/*.png   (left, grayscale)
    <root>/sequences/<seq>/image_1/*.png   (right)
    <root>/sequences/<seq>/calib.txt       (P0/P1 3x4)
    <root>/sequences/<seq>/times.txt
    <root>/poses/<seq>.txt                 (ground truth, 3x4 rows)

All functions are import-safe without the dataset present; loading
raises FileNotFoundError with a clear message.
"""
from __future__ import annotations

import os

import numpy as np

from front_end_tpu.geometry.camera import StereoRig


def _read_image(path):
    try:
        from PIL import Image
        return np.asarray(Image.open(path).convert("L"), np.float32)
    except ImportError:
        pass
    # minimal PGM fallback
    with open(path, "rb") as f:
        magic = f.readline().strip()
        if magic not in (b"P5", b"P2"):
            raise RuntimeError(f"cannot decode {path} without PIL")
        dims = f.readline().split()
        while dims and dims[0].startswith(b"#"):
            dims = f.readline().split()
        w, h = int(dims[0]), int(dims[1])
        f.readline()
        data = np.frombuffer(f.read(w * h), np.uint8).reshape(h, w)
        return data.astype(np.float32)


def load_calib(seq_dir: str) -> StereoRig:
    path = os.path.join(seq_dir, "calib.txt")
    P = {}
    with open(path) as f:
        for line in f:
            k, *vals = line.split()
            P[k.rstrip(":")] = np.array(vals, np.float64).reshape(3, 4)
    P0, P1 = P["P0"], P["P1"]
    fx, fy = P0[0, 0], P0[1, 1]
    cx, cy = P0[0, 2], P0[1, 2]
    baseline = -P1[0, 3] / P1[0, 0]
    # probe an image for dimensions
    img_dir = os.path.join(seq_dir, "image_0")
    first = sorted(os.listdir(img_dir))[0]
    img = _read_image(os.path.join(img_dir, first))
    return StereoRig.create(fx=fx, fy=fy, cx=cx, cy=cy, baseline=baseline,
                            width=img.shape[1], height=img.shape[0])


def load_poses(root: str, seq: str) -> np.ndarray:
    """(T, 4, 4) ground-truth world_T_camera poses."""
    path = os.path.join(root, "poses", f"{seq}.txt")
    rows = np.loadtxt(path).reshape(-1, 3, 4)
    T = np.tile(np.eye(4), (rows.shape[0], 1, 1))
    T[:, :3, :] = rows
    return T


class KittiSequence:
    def __init__(self, root: str, seq: str = "00",
                 max_frames: int | None = None):
        self.seq_dir = os.path.join(root, "sequences", seq)
        if not os.path.isdir(self.seq_dir):
            raise FileNotFoundError(
                f"KITTI sequence not found at {self.seq_dir}")
        self.rig = load_calib(self.seq_dir)
        self.left_dir = os.path.join(self.seq_dir, "image_0")
        self.right_dir = os.path.join(self.seq_dir, "image_1")
        self.names = sorted(os.listdir(self.left_dir))
        if max_frames:
            self.names = self.names[:max_frames]
        try:
            self.poses = load_poses(root, seq)[:len(self.names)]
        except (FileNotFoundError, OSError):
            self.poses = None

    def __len__(self):
        return len(self.names)

    def __getitem__(self, i):
        l = _read_image(os.path.join(self.left_dir, self.names[i]))
        r = _read_image(os.path.join(self.right_dir, self.names[i]))
        return l, r

    def frames(self):
        for i in range(len(self)):
            yield self[i]
