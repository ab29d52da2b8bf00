"""AKAZE — nonlinear (FED) scale space detector + M-SURF / MLDB descriptors.

Rebuild of the reference's vendored Alcantarilla AKAZE library
(`/root/reference/src/lib/AKAZE.cpp`):

- nonlinear scale space via Fast Explicit Diffusion
  (`AKAZE.cpp:102-171 Create_Nonlinear_Scale_Space`, FED step sizes from
  `lib/fed.cpp:41 fed_tau_by_process_time`);
- conductivities PM_G1 / PM_G2 / Weickert / Charbonnier
  (`lib/nldiffusion_functions.cpp:55-118`) with the contrast factor k as
  the 70th percentile of smoothed gradient magnitude
  (`compute_k_percentile`, `nldiffusion_functions.cpp:120`);
- explicit diffusion step `nld_step_scalar`
  (`nldiffusion_functions.cpp:210`) — a pure 4-neighbour stencil, ideal
  VPU work;
- scale-normalized determinant-of-Hessian response + scale-space extrema
  + subpixel refinement (`AKAZE.cpp:217-443`);
- M-SURF 64-float descriptor (`AKAZE.cpp:902-1015 Get_MSURF_Descriptor_64`)
  and full MLDB binary descriptor (`AKAZE.cpp:1017-1138
  Get_MLDB_Full_Descriptor`: 2×2 / 3×3 / 4×4 grids × 3 channels
  (Lt, Lx, Ly) × pairwise means comparisons = 486 bits).

TPU shape: every evolution level is a dense full-image stencil (no
per-pixel branches); FED inner steps are a `lax.scan` over a *static*
host-precomputed tau list; extrema/top-k follow the same static-K merge
used by the SIFT/SURF modules; descriptors are batched bilinear gathers
over host-constant rotated sample patterns, pooled with one matmul.

Documented deviations (static-shape driven):
- scale-space extremum test compares against neighbouring levels within
  the same octave only (the reference bilinearly resamples across octave
  boundaries);
- subpixel refinement is the in-level 2D quadratic fit;
- per-cell MLDB means are estimated from a fixed 3×3 sample grid per
  cell rather than exact pixel sums — self-consistent for matching, and
  BOUNDED with evidence (r5): on a rendered stereo pair with known
  epipolar geometry the full detect+describe+match path scores a 0.966
  inlier rate vs the independent cv2-ORB bar's 0.930 on the same images
  (`tests/test_family_parity.py::test_akaze_vs_independent_bar`);
- MLDB's 486 bits are zero-padded to 512 so Hamming packing stays in
  uint32 lanes (pad bits XOR to 0, distances are unchanged).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from front_end_tpu.ops.image import bilinear_sample, gaussian_blur, shift2d
from front_end_tpu.types import Descriptors, Keypoints

# defaults from the reference's AKAZEOptions (`lib/AKAZEConfig.h:84-120`)
SOFFSET = 1.6
DTHRESHOLD = 1e-3
KCONTRAST_PERCENTILE = 0.7


# --- FED step sizes (host-side, static) -------------------------------------

def fed_tau_by_process_time(T: float, tau_max: float = 0.25) -> np.ndarray:
    """FED cycle step sizes whose sum is the diffusion time T
    (`lib/fed.cpp:41-118`).  n steps of varying tau, each individually
    stable; returned as a static numpy vector so the inner loop scans a
    compile-time constant."""
    n = max(1, int(math.ceil(math.sqrt(3.0 * T / tau_max + 0.25) - 0.5
                             - 1e-8)))
    # unscaled taus sum to tau_max * n * (n + 1) / 3
    j = np.arange(n, dtype=np.float64)
    tau = tau_max / (2.0 * np.cos(np.pi * (2 * j + 1) / (4 * n + 2)) ** 2)
    scale = T / tau.sum()
    return (tau * scale).astype(np.float32)


# --- conductivities ----------------------------------------------------------

def conductivity(lx, ly, k, kind: str = "pm_g2"):
    """g(|∇L|) diffusivities (`nldiffusion_functions.cpp:55-118`)."""
    s = (lx * lx + ly * ly) / (k * k)
    if kind == "pm_g1":
        return jnp.exp(-s)
    if kind == "pm_g2":
        return 1.0 / (1.0 + s)
    if kind == "weickert":
        return 1.0 - jnp.exp(-3.315 / jnp.maximum(s * s * s * s, 1e-12))
    if kind == "charbonnier":
        return 1.0 / jnp.sqrt(1.0 + s)
    raise ValueError(f"unknown diffusivity {kind!r}")


def _grad(img):
    gx = 0.5 * (shift2d(img, 0, 1) - shift2d(img, 0, -1))
    gy = 0.5 * (shift2d(img, 1, 0) - shift2d(img, -1, 0))
    return gx, gy


def compute_k_percentile(img, perc: float = KCONTRAST_PERCENTILE,
                         gscale: float = 1.0):
    """Contrast factor: perc-percentile of nonzero gradient magnitudes of
    the gscale-smoothed image (`nldiffusion_functions.cpp:120-170`)."""
    sm = gaussian_blur(img, gscale)
    gx, gy = _grad(sm)
    mag = jnp.sqrt(gx * gx + gy * gy)[2:-2, 2:-2]
    mag = jnp.where(mag > 1e-6, mag, jnp.nan)
    k = jnp.nanquantile(mag.reshape(-1), perc)
    return jnp.where(jnp.isfinite(k) & (k > 1e-8), k, 0.03)


def nld_step(lt, g, tau: float):
    """One explicit diffusion step Lt += tau * div(g ∇Lt)
    (`nldiffusion_functions.cpp:210-280`), with reflecting borders via
    edge-clamped shifts."""
    xp = (g + shift2d(g, 0, 1)) * (shift2d(lt, 0, 1) - lt)
    xn = (g + shift2d(g, 0, -1)) * (lt - shift2d(lt, 0, -1))
    yp = (g + shift2d(g, 1, 0)) * (shift2d(lt, 1, 0) - lt)
    yn = (g + shift2d(g, -1, 0)) * (lt - shift2d(lt, -1, 0))
    return lt + 0.5 * tau * (xp - xn + yp - yn)


# --- nonlinear scale space ----------------------------------------------------

class Evolution(NamedTuple):
    lt: jnp.ndarray        # (h_o, w_o) diffused image
    lx: jnp.ndarray        # first derivatives at the detection scale
    ly: jnp.ndarray
    ldet: jnp.ndarray      # scale-normalized det-Hessian response
    sigma: float           # absolute scale at base resolution
    octave: int
    sublevel: int


def _derivative_stack(lt, sigma_local: float):
    """Scale-adapted derivatives: central differences with dilation
    step = round(sigma) (the reference's sigma-sized Scharr apertures,
    `AKAZE.cpp:217-242`), normalized back to unit step."""
    d = max(1, int(round(sigma_local)))
    inv = 1.0 / (2.0 * d)
    lx = (shift2d(lt, 0, d) - shift2d(lt, 0, -d)) * inv
    ly = (shift2d(lt, d, 0) - shift2d(lt, -d, 0)) * inv
    lxx = (shift2d(lx, 0, d) - shift2d(lx, 0, -d)) * inv
    lyy = (shift2d(ly, d, 0) - shift2d(ly, -d, 0)) * inv
    lxy = (shift2d(lx, d, 0) - shift2d(lx, -d, 0)) * inv
    return lx, ly, lxx, lyy, lxy


def nonlinear_scale_space(img, *, n_octaves: int = 4, n_sublevels: int = 4,
                          soffset: float = SOFFSET,
                          diffusivity: str = "pm_g2"):
    """Build the full evolution (`AKAZE.cpp:102-171`): per level, FED-step
    the image from t_{i-1} to t_i with conductivity from the smoothed
    gradient; halfsample at octave boundaries and shrink k by 0.75."""
    img = jnp.asarray(img, jnp.float32) / 255.0
    lt = gaussian_blur(img, soffset)
    k = compute_k_percentile(img)

    evolution = []
    t_prev = 0.5 * soffset ** 2
    for o in range(n_octaves):
        if o > 0:
            lt = gaussian_blur(lt, 1.0)[::2, ::2]
            k = k * 0.75
            t_prev = t_prev / 4.0  # time in octave-local pixel units
        for s in range(n_sublevels):
            sigma = soffset * (2.0 ** (o + s / n_sublevels))
            sigma_local = sigma / (1 << o)
            t_i = 0.5 * sigma_local ** 2
            if t_i > t_prev:
                taus = fed_tau_by_process_time(t_i - t_prev)
                sm = gaussian_blur(lt, 1.0)
                gx, gy = _grad(sm)
                g = conductivity(gx, gy, k, diffusivity)

                def body(l, tau):
                    return nld_step(l, g, tau), None
                lt, _ = jax.lax.scan(body, lt, jnp.asarray(taus))
            t_prev = t_i
            lx, ly, lxx, lyy, lxy = _derivative_stack(lt, sigma_local)
            norm = sigma_local ** 2
            ldet = (lxx * lyy - lxy * lxy) * (norm * norm)
            evolution.append(Evolution(lt=lt, lx=lx * jnp.sqrt(norm),
                                       ly=ly * jnp.sqrt(norm), ldet=ldet,
                                       sigma=float(sigma), octave=o,
                                       sublevel=s))
    return evolution


# --- detection ----------------------------------------------------------------

class AkazeDetections(NamedTuple):
    keypoints: Keypoints
    sigma: jnp.ndarray     # (K,) absolute scale
    level: jnp.ndarray     # (K,) int32 evolution index


def detect(img, *, n_octaves: int = 4, n_sublevels: int = 4,
           threshold: float = DTHRESHOLD, max_keypoints: int = 512,
           diffusivity: str = "pm_g2",
           evolution: list[Evolution] | None = None) -> AkazeDetections:
    """Scale-space extrema of the det-Hessian response
    (`AKAZE.cpp:243-379 Find_Scale_Space_Extrema` + `Do_Subpixel_Refinement`
    :381-443), static top-K per level merged to one capacity-K set."""
    img = jnp.asarray(img, jnp.float32)
    evo = evolution if evolution is not None else nonlinear_scale_space(
        img, n_octaves=n_octaves, n_sublevels=n_sublevels,
        diffusivity=diffusivity)
    n_levels = len(evo)
    per = max(16, max_keypoints // max(1, n_levels - 1))

    xs_l, ys_l, sc_l, sg_l, lv_l = [], [], [], [], []
    for i, ev in enumerate(evo):
        if ev.sublevel == 0 and ev.octave == 0:
            continue  # first level has no finer neighbour; skip like ref
        ld = ev.ldet
        h, w = ld.shape
        mx = jnp.full_like(ld, -jnp.inf)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                mx = jnp.maximum(mx, shift2d(ld, dy, dx))
        is_max = (ld > mx) & (ld > threshold)
        # same-octave scale neighbours (deviation: no cross-octave resample)
        for j in (i - 1, i + 1):
            if 0 <= j < n_levels and evo[j].octave == ev.octave:
                is_max = is_max & (ld > evo[j].ldet)
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        border = max(4, int(round(ev.sigma / (1 << ev.octave))) * 3)
        interior = ((ys >= border) & (ys < h - border)
                    & (xs >= border) & (xs < w - border))
        score = jnp.where(is_max & interior, ld, 0.0)

        # in-level 2D quadratic subpixel fit (AKAZE.cpp:381-443)
        dxx = shift2d(ld, 0, 1) + shift2d(ld, 0, -1) - 2 * ld
        dyy = shift2d(ld, 1, 0) + shift2d(ld, -1, 0) - 2 * ld
        dxy = 0.25 * (shift2d(ld, 1, 1) + shift2d(ld, -1, -1)
                      - shift2d(ld, 1, -1) - shift2d(ld, -1, 1))
        gx = 0.5 * (shift2d(ld, 0, 1) - shift2d(ld, 0, -1))
        gy = 0.5 * (shift2d(ld, 1, 0) - shift2d(ld, -1, 0))
        det = dxx * dyy - dxy * dxy
        den = jnp.where(jnp.abs(det) > 1e-18, det, 1.0)
        offx = jnp.clip(-(dyy * gx - dxy * gy) / den, -0.5, 0.5)
        offy = jnp.clip(-(dxx * gy - dxy * gx) / den, -0.5, 0.5)

        v, idx = jax.lax.top_k(score.reshape(-1), per)
        scale = float(1 << ev.octave)
        yy = ((idx // w).astype(jnp.float32) + offy.reshape(-1)[idx]) * scale
        xx = ((idx % w).astype(jnp.float32) + offx.reshape(-1)[idx]) * scale
        xs_l.append(xx)
        ys_l.append(yy)
        sc_l.append(v)
        sg_l.append(jnp.full((per,), ev.sigma, jnp.float32))
        lv_l.append(jnp.full((per,), i, jnp.int32))

    xs = jnp.concatenate(xs_l)
    ys = jnp.concatenate(ys_l)
    sc = jnp.concatenate(sc_l)
    sg = jnp.concatenate(sg_l)
    lv = jnp.concatenate(lv_l)
    if xs.shape[0] < max_keypoints:  # pad so top_k capacity is static
        pad = max_keypoints - xs.shape[0]
        xs = jnp.pad(xs, (0, pad))
        ys = jnp.pad(ys, (0, pad))
        sc = jnp.pad(sc, (0, pad))
        sg = jnp.pad(sg, (0, pad), constant_values=1.0)
        lv = jnp.pad(lv, (0, pad))
    v, sel = jax.lax.top_k(jnp.where(sc > 0, sc, -1.0), max_keypoints)
    kps = Keypoints(xy=jnp.stack([xs[sel], ys[sel]], -1), score=v,
                    angle=jnp.zeros((max_keypoints,)), valid=v > 0)
    return AkazeDetections(keypoints=kps, sigma=sg[sel], level=lv[sel])


def detect_dense(img, *, threshold: float = DTHRESHOLD, n_octaves: int = 4,
                 n_sublevels: int = 4, diffusivity: str = "pm_g2"):
    """Base-resolution score map (max over levels, coarse levels
    nearest-upsampled); corners are `map > 0`.  The factory-uniform
    entry matching `ops/fast.detect_dense` / `ops/surf.detect_dense`."""
    img = jnp.asarray(img, jnp.float32)
    h, w = img.shape
    evo = nonlinear_scale_space(img, n_octaves=n_octaves,
                                n_sublevels=n_sublevels,
                                diffusivity=diffusivity)
    out = jnp.zeros((h, w), jnp.float32)
    for i, ev in enumerate(evo):
        if ev.sublevel == 0 and ev.octave == 0:
            continue
        ld = ev.ldet
        hh, ww = ld.shape
        mx = jnp.full_like(ld, -jnp.inf)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                mx = jnp.maximum(mx, shift2d(ld, dy, dx))
        is_max = (ld > mx) & (ld > threshold)
        for j in (i - 1, i + 1):
            if 0 <= j < len(evo) and evo[j].octave == ev.octave:
                is_max = is_max & (ld > evo[j].ldet)
        score = jnp.where(is_max, ld, 0.0)
        f = 1 << ev.octave
        if f > 1:
            score = jnp.kron(score, jnp.ones((f, f), jnp.float32))
        out = jnp.maximum(out, score[:h, :w])
    return out


# --- per-keypoint sampling from the evolution ---------------------------------

def _sample_levels(evo, field: str, xy_base, level_id):
    """Bilinear-sample `field` of each keypoint's own evolution level.
    Static loop over levels; octave-resolution arrays are sampled at
    base-resolution coordinates / 2^octave and merged with where()."""
    out = jnp.zeros(xy_base.shape[:-1], jnp.float32)
    for i, ev in enumerate(evo):
        arr = getattr(ev, field)
        pts = xy_base / float(1 << ev.octave)
        vals = bilinear_sample(arr, pts.reshape(-1, 2)).reshape(out.shape)
        out = jnp.where(level_id == i, vals, out)
    return out


def orientations(evo, xy, sigma, level_id, valid):
    """Dominant orientation from Lx/Ly in a 6σ disc with a 60° sliding
    window (`AKAZE.cpp:788-860 Compute_Main_Orientation`)."""
    # fixed 109-sample disc of radius 6 (host constant), like SURF's
    offs = [(dy, dx) for dy in range(-6, 7) for dx in range(-6, 7)
            if dy * dy + dx * dx <= 36]
    offs = np.asarray(offs, np.float32)                    # (P, 2) [dy, dx]
    w_g = np.exp(-(offs ** 2).sum(1) / (2 * 2.5 ** 2)).astype(np.float32)
    offs_j = jnp.asarray(offs)
    wj = jnp.asarray(w_g)

    step = jnp.asarray(sigma)[:, None]                     # (N, 1)
    px = xy[:, 0:1] + offs_j[None, :, 1] * step            # (N, P)
    py = xy[:, 1:2] + offs_j[None, :, 0] * step
    pts = jnp.stack([px, py], -1)
    lid = jnp.asarray(level_id)[:, None] * jnp.ones_like(px, jnp.int32)
    rx = _sample_levels(evo, "lx", pts, lid) * wj[None]
    ry = _sample_levels(evo, "ly", pts, lid) * wj[None]

    ang = jnp.arctan2(ry, rx)                              # (N, P)
    n_dirs = 42  # sliding-window centres (ref slides by ~0.15 rad)
    centres = jnp.linspace(-jnp.pi, jnp.pi, n_dirs, endpoint=False)
    d = jnp.abs(ang[:, None, :] - centres[None, :, None])
    d = jnp.minimum(d, 2 * jnp.pi - d)
    in_win = (d <= jnp.pi / 6.0).astype(jnp.float32)       # (N, C, P)
    sx = jnp.einsum("ncp,np->nc", in_win, rx)
    sy = jnp.einsum("ncp,np->nc", in_win, ry)
    mag = sx * sx + sy * sy
    best = jnp.argmax(mag, -1)
    bi = jnp.arange(xy.shape[0])
    angle = jnp.arctan2(sy[bi, best], sx[bi, best])
    return jnp.where(jnp.asarray(valid), angle, 0.0)


# --- M-SURF 64 descriptor ------------------------------------------------------

def describe_msurf(evo, xy, sigma, angle, level_id, valid) -> Descriptors:
    """M-SURF 64 (`AKAZE.cpp:902-1015`): 4×4 subregions over a 24σ patch,
    9×9 samples each with 2-sample overlap, per-subregion Gaussian σ=2.5
    and global σ=1.5 over subregion centres; sums of (dx, dy, |dx|, |dy|)
    of the rotated evolution derivatives, L2-normalized."""
    n = xy.shape[0]
    S = 20  # 20x20 sample lattice spanning the 4x4 subregions + overlap
    offs = (np.mgrid[0:S, 0:S].reshape(2, -1).T.astype(np.float32)
            - (S - 1) / 2.0)                               # (P, 2) [dy, dx]
    # subregion weight matrix with overlap: each sample contributes to
    # every subregion whose 9x9 window (stride 5) covers it
    P = offs.shape[0]
    wmat = np.zeros((P, 16), np.float32)
    for ci in range(4):
        for cj in range(4):
            cy = (ci - 1.5) * 5.0
            cx = (cj - 1.5) * 5.0
            d2 = ((offs[:, 0] - cy) ** 2 + (offs[:, 1] - cx) ** 2)
            inside = (np.abs(offs[:, 0] - cy) <= 4.5) & \
                     (np.abs(offs[:, 1] - cx) <= 4.5)
            g = np.exp(-d2 / (2 * 2.5 ** 2)) * inside
            g_global = math.exp(-(cy ** 2 + cx ** 2) / (2 * (1.5 * 5) ** 2))
            wmat[:, ci * 4 + cj] = g * g_global
    offs_j = jnp.asarray(offs)
    wmat_j = jnp.asarray(wmat)

    ca, sa = jnp.cos(angle), jnp.sin(angle)
    step = (jnp.asarray(sigma) * 24.0 / S)[:, None]
    rx = (offs_j[None, :, 1] * ca[:, None]
          - offs_j[None, :, 0] * sa[:, None]) * step
    ry = (offs_j[None, :, 1] * sa[:, None]
          + offs_j[None, :, 0] * ca[:, None]) * step
    pts = jnp.stack([xy[:, 0:1] + rx, xy[:, 1:2] + ry], -1)   # (N, P, 2)
    lid = jnp.asarray(level_id)[:, None] * jnp.ones((n, P), jnp.int32)
    gx = _sample_levels(evo, "lx", pts, lid)
    gy = _sample_levels(evo, "ly", pts, lid)
    # rotate gradients into the keypoint frame
    dx = gx * ca[:, None] + gy * sa[:, None]
    dy = -gx * sa[:, None] + gy * ca[:, None]
    feats = jnp.stack([dx, dy, jnp.abs(dx), jnp.abs(dy)], -1)  # (N, P, 4)
    cells = jnp.einsum("npf,pc->ncf", feats, wmat_j)           # (N, 16, 4)
    vec = cells.reshape(n, 64)
    vec = vec / jnp.maximum(jnp.linalg.norm(vec, axis=-1, keepdims=True),
                            1e-9)
    vec = vec * jnp.asarray(valid)[:, None]
    return Descriptors(bits=vec)


# --- MLDB full descriptor --------------------------------------------------------

MLDB_BITS = 486          # 3 channels x (6 + 36 + 120) pairwise comparisons
MLDB_PADDED = 512


def _mldb_pattern():
    """Host constants for the 2x2/3x3/4x4 grids: per-cell 3x3 sample
    offsets in pattern units ([-1, 1] patch), and pair index lists."""
    grids = []
    for div in (2, 3, 4):
        cells = []
        for ci in range(div):
            for cj in range(div):
                # cell centre in [-1, 1]
                cy = (ci + 0.5) / div * 2.0 - 1.0
                cx = (cj + 0.5) / div * 2.0 - 1.0
                half = 1.0 / div
                sub = (np.mgrid[0:3, 0:3].reshape(2, -1).T
                       .astype(np.float32) - 1.0) * (half * 2 / 3)
                pts = np.stack([cy + sub[:, 0], cx + sub[:, 1]], -1)
                cells.append(pts)
        n_cells = div * div
        pairs = [(i, j) for i in range(n_cells) for j in range(i + 1,
                                                               n_cells)]
        grids.append((np.asarray(cells, np.float32),
                      np.asarray(pairs, np.int32)))
    return grids


_MLDB_GRIDS = _mldb_pattern()


def describe_mldb(evo, xy, sigma, angle, level_id, valid) -> Descriptors:
    """Full MLDB (`AKAZE.cpp:1017-1138`): for grids 2×2/3×3/4×4, per-cell
    means of (Lt, Lx', Ly') over the rotated 10σ patch, then all pairwise
    mean comparisons per channel → 486 bits, zero-padded to 512."""
    n = xy.shape[0]
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    radius = jnp.asarray(sigma) * 5.0                      # pattern 10σ

    bit_groups = []
    for cells, pairs in _MLDB_GRIDS:
        n_cells, n_sub = cells.shape[0], cells.shape[1]
        offs = jnp.asarray(cells.reshape(-1, 2))           # (C*9, 2) [dy,dx]
        rx = (offs[None, :, 1] * ca[:, None]
              - offs[None, :, 0] * sa[:, None]) * radius[:, None]
        ry = (offs[None, :, 1] * sa[:, None]
              + offs[None, :, 0] * ca[:, None]) * radius[:, None]
        pts = jnp.stack([xy[:, 0:1] + rx, xy[:, 1:2] + ry], -1)
        lid = (jnp.asarray(level_id)[:, None]
               * jnp.ones((n, offs.shape[0]), jnp.int32))
        lt = _sample_levels(evo, "lt", pts, lid)
        gx = _sample_levels(evo, "lx", pts, lid)
        gy = _sample_levels(evo, "ly", pts, lid)
        dx = gx * ca[:, None] + gy * sa[:, None]
        dy = -gx * sa[:, None] + gy * ca[:, None]
        chans = jnp.stack([lt, dx, dy], 1)                 # (N, 3, C*9)
        means = chans.reshape(n, 3, n_cells, n_sub).mean(-1)  # (N, 3, C)
        pi = jnp.asarray(pairs[:, 0])
        pj = jnp.asarray(pairs[:, 1])
        bits = (means[:, :, pi] > means[:, :, pj])         # (N, 3, Pairs)
        bit_groups.append(bits.reshape(n, -1))
    allbits = jnp.concatenate(bit_groups, -1).astype(jnp.float32)
    pad = MLDB_PADDED - allbits.shape[-1]
    allbits = jnp.pad(allbits, ((0, 0), (0, pad)))
    allbits = allbits * jnp.asarray(valid)[:, None]
    return Descriptors(bits=allbits)


def detect_and_describe(img, *, n_octaves: int = 4, n_sublevels: int = 4,
                        threshold: float = DTHRESHOLD,
                        max_keypoints: int = 512,
                        descriptor: str = "mldb",
                        diffusivity: str = "pm_g2"):
    """AKAZE entry point (`AKAZE.cpp:455-530 Compute_Descriptors` dispatch:
    descriptor ∈ {mldb, msurf}, matching the reference's
    DESCRIPTOR_MLDB / DESCRIPTOR_SURF_UPRIGHT family enums,
    `lib/AKAZEConfig.h:41-57`)."""
    img = jnp.asarray(img, jnp.float32)
    evo = nonlinear_scale_space(img, n_octaves=n_octaves,
                                n_sublevels=n_sublevels,
                                diffusivity=diffusivity)
    det = detect(img, threshold=threshold, max_keypoints=max_keypoints,
                 evolution=evo)
    kps = det.keypoints
    ang = orientations(evo, kps.xy, det.sigma, det.level, kps.valid)
    if descriptor == "mldb":
        desc = describe_mldb(evo, kps.xy, det.sigma, ang, det.level,
                             kps.valid)
    elif descriptor == "msurf":
        desc = describe_msurf(evo, kps.xy, det.sigma, ang, det.level,
                              kps.valid)
    else:
        raise ValueError(f"unknown AKAZE descriptor {descriptor!r}")
    return det._replace(keypoints=kps.replace(angle=ang)), desc
