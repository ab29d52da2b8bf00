"""cv2-based reference stereo VO — the independent-implementation oracle
(SURVEY §4.2: consistency oracles between independent implementations).

Frame-to-frame ORB stereo odometry built purely on OpenCV + numpy: FAST/
ORB detection, brute-force Hamming matching with crossCheck, epipolar +
disparity gating, stereo triangulation, rigid Kabsch with median-residual
rejection.  Used by the ATE-bound tests to score the TPU pipeline
against what a straightforward OpenCV implementation achieves on the
same frames (BASELINE.md: "ATE within OpenCV-reference bound").
"""
from __future__ import annotations

import cv2
import numpy as np


def kabsch(B, A):
    """Rigid H with A ≈ R·B + t."""
    cb, ca = B.mean(0), A.mean(0)
    Hm = (B - cb).T @ (A - ca)
    U, _, Vt = np.linalg.svd(Hm)
    D = np.diag([1, 1, np.sign(np.linalg.det(Vt.T @ U.T))])
    Rm = Vt.T @ D @ U.T
    out = np.eye(4)
    out[:3, :3] = Rm
    out[:3, 3] = ca - Rm @ cb
    return out


def cv2_stereo_vo(lefts, rights, rig, *, nfeatures: int = 1500,
                  fast_threshold: int = 15, epi_px: float = 0.7,
                  max_disparity: float = 192.0):
    """Returns (T,4,4) world_T_camera estimates (pose 0 = identity)."""
    orb = cv2.ORB_create(nfeatures=nfeatures, fastThreshold=fast_threshold)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
    prev = None
    poses = [np.eye(4)]
    fx = float(rig.fx)
    cx, cy, base = float(rig.cx), float(rig.cy), float(rig.baseline)
    for L, R in zip(lefts, rights):
        L8, R8 = L.astype(np.uint8), R.astype(np.uint8)
        kl, dl = orb.detectAndCompute(L8, None)
        kr, dr = orb.detectAndCompute(R8, None)
        if dl is None or dr is None:
            poses.append(poses[-1])
            continue
        ms = bf.match(dl, dr)
        pts, desc = [], []
        for m in ms:
            pl = np.array(kl[m.queryIdx].pt)
            pr = np.array(kr[m.trainIdx].pt)
            d = pl[0] - pr[0]
            if abs(pl[1] - pr[1]) <= epi_px and 0.5 < d < max_disparity:
                z = fx * base / d
                X = np.array([(pl[0] - cx) * z / fx,
                              (pl[1] - cy) * z / fx, z])
                pts.append(X)
                desc.append(dl[m.queryIdx])
        if prev is not None and len(pts) > 8 and len(prev[0]) > 8:
            m2 = bf.match(np.array(desc), np.array(prev[1]))
            A = np.array([pts[m.queryIdx] for m in m2])
            B = np.array([prev[0][m.trainIdx] for m in m2])
            if len(A) >= 4:
                H = kabsch(B, A)
                r = np.linalg.norm(
                    A - (B @ H[:3, :3].T + H[:3, 3]), axis=1)
                keep = r < np.maximum(3 * np.median(r), 0.05)
                if keep.sum() >= 4:
                    H = kabsch(B[keep], A[keep])
                poses.append(poses[-1] @ np.linalg.inv(H))
            else:
                poses.append(poses[-1])
        else:
            poses.append(poses[-1])
        prev = (np.array(pts) if pts else np.zeros((0, 3)),
                np.array(desc) if desc else np.zeros((0, 32), np.uint8))
    return np.stack(poses[1:])
