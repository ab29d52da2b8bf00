"""Debug rendering — keypoints, stereo matches, anaglyphs, track overlays.

Rebuild of `/root/reference/src/front_end/visualize.py`:
- `drawStereoLandmarks` (:7)  -> `draw_matches`
- `genStereoscopicImage` (:52) -> `anaglyph`
- `drawFrameTracks` (:66)     -> `draw_tracks`

Pure-numpy host-side rasterization (no OpenCV dependency): these run on
debug/visualisation paths, never inside the jit pipeline.  All take
grayscale float images in [0,255] and return (H, W, 3) uint8.
"""
from __future__ import annotations

import numpy as np

GREEN = (0, 255, 0)
RED = (255, 0, 0)
BLUE = (0, 128, 255)
YELLOW = (255, 255, 0)


def _to_rgb(img):
    img = np.asarray(img)
    if img.ndim == 3:                       # already RGB (e.g. anaglyph)
        return np.ascontiguousarray(img.astype(np.uint8))
    g = np.clip(img, 0, 255).astype(np.uint8)
    return np.stack([g, g, g], -1)


def _plot_line(canvas, p0, p1, color):
    """Integer Bresenham-ish line via dense sampling."""
    x0, y0 = float(p0[0]), float(p0[1])
    x1, y1 = float(p1[0]), float(p1[1])
    n = int(max(abs(x1 - x0), abs(y1 - y0), 1)) + 1
    xs = np.linspace(x0, x1, n).round().astype(int)
    ys = np.linspace(y0, y1, n).round().astype(int)
    H, W = canvas.shape[:2]
    ok = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
    canvas[ys[ok], xs[ok]] = color


def _plot_cross(canvas, p, color, r=2):
    x, y = int(round(float(p[0]))), int(round(float(p[1])))
    H, W = canvas.shape[:2]
    for d in range(-r, r + 1):
        if 0 <= y + d < H and 0 <= x < W:
            canvas[y + d, x] = color
        if 0 <= y < H and 0 <= x + d < W:
            canvas[y, x + d] = color


def draw_keypoints(img, kps, color=GREEN):
    """Keypoints overlay (cv2.drawKeypoints capability)."""
    out = _to_rgb(img)
    xy = np.asarray(kps.xy)
    for i in np.nonzero(np.asarray(kps.valid))[0]:
        _plot_cross(out, xy[i], color)
    return out


def draw_matches(left, kl, right, kr, matches, color=GREEN):
    """Side-by-side stereo match rendering (`visualize.py:7-50`)."""
    L, R = _to_rgb(left), _to_rgb(right)
    H = max(L.shape[0], R.shape[0])
    W = L.shape[1] + R.shape[1]
    out = np.zeros((H, W, 3), np.uint8)
    out[:L.shape[0], :L.shape[1]] = L
    out[:R.shape[0], L.shape[1]:] = R
    xl = np.asarray(kl.xy)
    xr = np.asarray(kr.xy)
    ti = np.asarray(matches.train_idx)
    for q in np.nonzero(np.asarray(matches.valid))[0]:
        p0 = xl[q]
        p1 = xr[ti[q]] + np.array([L.shape[1], 0.0])
        _plot_line(out, p0, p1, color)
        _plot_cross(out, p0, RED)
        _plot_cross(out, p1, BLUE)
    return out


def draw_stereo_uv4(left, right, uv4, valid, color=GREEN):
    """Side-by-side stereo match rendering straight from the pipeline's
    (N, 4) [ul,vl,ur,vr] measurement rows — the live-debug form of
    `draw_matches` (`visualize.py:7-50`), drawable from any
    `FrameFeatures.uv4`/`stereo_valid` without a Matches object."""
    L, R = _to_rgb(left), _to_rgb(right)
    H = max(L.shape[0], R.shape[0])
    W = L.shape[1] + R.shape[1]
    out = np.zeros((H, W, 3), np.uint8)
    out[:L.shape[0], :L.shape[1]] = L
    out[:R.shape[0], L.shape[1]:] = R
    uv = np.asarray(uv4)
    for i in np.nonzero(np.asarray(valid))[0]:
        p0 = uv[i, :2]
        p1 = uv[i, 2:] + np.array([L.shape[1], 0.0])
        _plot_line(out, p0, p1, color)
        _plot_cross(out, p0, RED)
        _plot_cross(out, p1, BLUE)
    return out


def anaglyph(left, right):
    """Red/cyan stereoscopic composite (`genStereoscopicImage`,
    `visualize.py:52-64`: left -> red channel, right -> blue/green)."""
    L = np.clip(np.asarray(left), 0, 255).astype(np.uint8)
    R = np.clip(np.asarray(right), 0, 255).astype(np.uint8)
    return np.stack([L, R, R], -1)


def draw_tracks(img, xy_prev, xy_cur, inliers, valid):
    """Inter-frame track overlay (`drawFrameTracks`, `visualize.py:66-109`):
    green = motion inliers, red = outliers."""
    out = _to_rgb(img)
    xp = np.asarray(xy_prev)
    xc = np.asarray(xy_cur)
    inl = np.asarray(inliers)
    for i in np.nonzero(np.asarray(valid))[0]:
        col = GREEN if inl[i] else RED
        _plot_line(out, xp[i], xc[i], col)
        _plot_cross(out, xc[i], col, r=1)
    return out
