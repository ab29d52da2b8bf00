"""Adaptive grid-bucketed FAST detection with per-cell threshold control.

Rebuild of the reference's signature detector:
- C++ hot loop (`/root/reference/src/live_stereo.cpp:277-318`): 2×3 grid,
  per-cell integer FAST threshold, ±1 feedback toward a per-cell detection
  set-point, 20 % hysteresis band, thresholds clipped to [4, 80];
- Python twin (`src/front_end/features.py:590-641`): clip [6, 80] and
  asymmetric row shares (bottom row 2× bucket share, top row 0.5×).

TPU-native shape: one dense FAST score map per image (the margin score
makes one map valid for every threshold), a per-cell threshold IMAGE
broadcast from the (Gr, Gc) controller state, post-NMS per-cell counts by
reshape+sum, and per-cell top-k to produce a fixed-capacity `Keypoints`
set.  The controller update is pure: `detect` returns the new threshold
state, which the caller carries (e.g. through `lax.scan` over a video).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from front_end_tpu.ops import fast as fast_mod
from front_end_tpu.types import Keypoints


@struct.dataclass
class GridConfig:
    grid_rows: int = struct.field(pytree_node=False, default=2)
    grid_cols: int = struct.field(pytree_node=False, default=3)
    set_point: int = struct.field(pytree_node=False, default=1000)
    min_threshold: float = struct.field(pytree_node=False, default=4.0)
    max_threshold: float = struct.field(pytree_node=False, default=80.0)
    init_threshold: float = struct.field(pytree_node=False, default=15.0)
    hysteresis: float = struct.field(pytree_node=False, default=0.2)
    cell_capacity: int = struct.field(pytree_node=False, default=512)
    fast_type: str = struct.field(pytree_node=False, default="9_16")
    # row_shares scales each grid row's set-point (features.py:626-631
    # uses (0.5, 2.0) top-to-bottom for a ground-heavy scene); None = equal.
    row_shares: tuple | None = struct.field(pytree_node=False, default=None)
    # two-stage top-k: per-chunk pre-selection width.  The selection runs
    # over the 2x2 PRE-POOLED grid, so a chunk of `chunk_size` entries
    # spans 4*chunk_size pixels and (NMS guaranteeing at most 1 survivor
    # per 2x2 block) can hold up to `chunk_size` true corners.  128 only
    # drops corners past >1 NMS survivor per 32 px sustained across a
    # whole 4096-px strip (double the old 64's safety margin) and is the
    # measured sweet spot on the v5e: 1.59 ms/pair vs 1.66 (64) and
    # 1.84 (256) at KITTI res — wider preselects pay more in the
    # per-chunk sort than they save in the winner-pool pass.
    chunk_size: int = struct.field(pytree_node=False, default=1024)
    chunk_topk: int = struct.field(pytree_node=False, default=128)

    @property
    def capacity(self) -> int:
        return self.grid_rows * self.grid_cols * self.cell_capacity

    def cell_set_points(self):
        gs = self.set_point / (self.grid_rows * self.grid_cols)
        sp = jnp.full((self.grid_rows, self.grid_cols), gs, jnp.float32)
        if self.row_shares is not None:
            sp = sp * jnp.asarray(self.row_shares, jnp.float32)[:, None]
        return sp

    def init_thresholds(self):
        return jnp.full((self.grid_rows, self.grid_cols),
                        self.init_threshold, jnp.float32)


class GridDetections(NamedTuple):
    keypoints: Keypoints          # capacity Gr*Gc*cell_capacity
    thresholds: jnp.ndarray       # (Gr, Gc) updated controller state
    cell_counts: jnp.ndarray      # (Gr, Gc) post-NMS corner counts


def _cell_dims(H, W, cfg: GridConfig):
    ch, cw = H // cfg.grid_rows, W // cfg.grid_cols
    return ch, cw


def _topk_2stage(cells, k: int, chunk: int, k0: int):
    """Hierarchical top-k over the last axis: per-chunk top-k0, then
    global top-k over the chunk winners.  `lax.top_k` over the raw ~77k
    cell pixels costs milliseconds on TPU; two small selections cost
    ~100 µs.  Exact whenever no chunk holds more than k0 survivors.
    Returns (values, flat indices) shaped (..., k)."""
    *lead, M = cells.shape
    k0 = min(k0, chunk, k)
    C = -(-M // chunk)
    pad = C * chunk - M
    if pad:
        cells = jnp.pad(cells, [(0, 0)] * len(lead) + [(0, pad)],
                        constant_values=-1.0)
    ch = cells.reshape(*lead, C, chunk)
    v0, i0 = jax.lax.top_k(ch, k0)                       # (..., C, k0)
    base = (jnp.arange(C, dtype=jnp.int32) * chunk)[:, None]
    flat0 = (i0.astype(jnp.int32) + base).reshape(*lead, C * k0)
    v0 = v0.reshape(*lead, C * k0)
    if C * k0 < k:  # small images: winner pool smaller than capacity
        short = k - C * k0
        v0 = jnp.pad(v0, [(0, 0)] * len(lead) + [(0, short)],
                     constant_values=-1.0)
        flat0 = jnp.pad(flat0, [(0, 0)] * len(lead) + [(0, short)])
    v, sel = jax.lax.top_k(v0, k)                        # (..., k)
    idx = jnp.take_along_axis(flat0, sel, axis=-1)
    return v, jnp.minimum(idx, M - 1)


def threshold_image(thresholds, H: int, W: int, cfg: GridConfig):
    """(Gr, Gc) -> (H, W) per-pixel threshold map.  Pixels beyond the last
    full cell (when the image size is not divisible) reuse the edge cell,
    mirroring the reference's implicit crop of partial cells."""
    ch, cw = _cell_dims(H, W, cfg)
    t = jnp.repeat(jnp.repeat(thresholds, ch, axis=0), cw, axis=1)
    pad_h, pad_w = H - t.shape[0], W - t.shape[1]
    return jnp.pad(t, ((0, pad_h), (0, pad_w)), mode="edge")


def detect(img, thresholds, cfg: GridConfig) -> GridDetections:
    """Adaptive grid FAST on one image: (H, W) + (Gr, Gc) state.

    Returns fixed-capacity keypoints (per-cell top-k by FAST score),
    the updated per-cell thresholds (reference PI rule: ±1 when the
    post-NMS count misses the set-point by >20 %), and the raw counts.
    """
    H, W = img.shape[-2:]
    tmap = threshold_image(thresholds, H, W, cfg)
    if _use_fused_grid_kernel(cfg, img, tmap):
        from front_end_tpu.ops.pallas import fast_kernel
        ch, cw = _cell_dims(H, W, cfg)
        pooled, code, counts = fast_kernel.fast_detect_grid_pallas(
            img, tmap, cfg.fast_type, nms=True,
            cell=(cfg.grid_rows, cfg.grid_cols, ch, cw))
        return _select_from_pooled(pooled, code, counts, thresholds,
                                   cfg, H, W)
    smap = fast_mod.detect_dense(img, tmap, cfg.fast_type, nms=True)
    return _detect_from_map(smap, thresholds, cfg)


def _detect_from_map(smap, thresholds, cfg: GridConfig) -> GridDetections:
    """Controller update + per-cell top-k from a surviving-corner score
    map (split from `detect` so the pair path can compute the FAST
    margins OUTSIDE the pair vmap, where the Pallas kernel applies)."""
    H, W = smap.shape[-2:]
    ch, cw = _cell_dims(H, W, cfg)
    Gr, Gc = cfg.grid_rows, cfg.grid_cols

    # crop to whole cells; (Gr, ch, Gc, cw) cell tensor
    s4 = smap[:Gr * ch, :Gc * cw].reshape(Gr, ch, Gc, cw)

    counts = jnp.sum(s4 > 0, axis=(1, 3))

    # reference controller (live_stereo.cpp:294-318)
    err = counts.astype(jnp.float32) - cfg.cell_set_points()
    move = jnp.abs(err) > cfg.hysteresis * cfg.cell_set_points()
    delta = jnp.where(err > 0, 1.0, -1.0) * move
    new_t = jnp.clip(thresholds + delta, cfg.min_threshold, cfg.max_threshold)

    # LOSSLESS 2x2 pre-pool before the top-k: cv2-exact NMS annihilates
    # score ties, so no two survivors are 8-adjacent and any 2x2 block
    # holds at most ONE — max-pooling quarters the selection problem
    # exactly (3x3 would not: survivors can sit 2 px apart).  Built from
    # strided slices (lane shuffles), NOT a blocked transpose — the
    # transpose formulation cost more than the sort it saved.
    s4p = jnp.pad(s4, ((0, 0), (0, ch % 2), (0, 0), (0, cw % 2)))
    colA, colB = s4p[..., 0::2], s4p[..., 1::2]
    m1 = jnp.maximum(colA, colB)                 # (Gr, ch2, Gc, pw)
    w1 = colB > colA                             # col sub-offset at (row, pxc)
    rowA, rowB = m1[:, 0::2], m1[:, 1::2]
    pooled = jnp.maximum(rowA, rowB)             # (Gr, ph, Gc, pw)
    w2 = rowB > rowA                             # row sub-offset at (pyc, pxc)
    ph, pw = pooled.shape[1], pooled.shape[3]
    ch2 = m1.shape[1]

    cells = pooled.transpose(0, 2, 1, 3).reshape(Gr, Gc, ph * pw)

    # per-cell top-k over the pooled grid
    k = cfg.cell_capacity
    top, pool_idx = _topk_2stage(cells, k, cfg.chunk_size, cfg.chunk_topk)
    pyc = pool_idx // pw                         # (Gr, Gc, k) pooled row
    pxc = pool_idx % pw
    # reconstruct full-res cell coords from the winner masks
    w2c = w2.transpose(0, 2, 1, 3).reshape(Gr, Gc, ph * pw)
    rsub = jnp.take_along_axis(w2c, pool_idx, axis=-1)
    row = 2 * pyc + rsub.astype(jnp.int32)       # (Gr, Gc, k) in [0, ch2)
    w1c = w1.transpose(0, 2, 1, 3).reshape(Gr, Gc, ch2 * pw)
    csub = jnp.take_along_axis(w1c, row * pw + pxc, axis=-1)
    col = 2 * pxc + csub.astype(jnp.int32)
    cy = jnp.minimum(row, ch - 1)
    cx = jnp.minimum(col, cw - 1)
    row0 = jnp.arange(Gr, dtype=jnp.int32)[:, None, None] * ch
    col0 = jnp.arange(Gc, dtype=jnp.int32)[None, :, None] * cw
    ys = (cy + row0).reshape(-1)
    xs = (cx + col0).reshape(-1)
    score = top.reshape(-1)
    valid = score > 0

    kps = Keypoints(
        xy=jnp.stack([xs, ys], -1).astype(jnp.float32),
        score=score.astype(jnp.float32),
        angle=jnp.zeros_like(score, jnp.float32),
        valid=valid)
    return GridDetections(keypoints=kps, thresholds=new_t, cell_counts=counts)


def _select_from_pooled(pooled, code, counts, thresholds,
                        cfg: GridConfig, H: int, W: int
                        ) -> GridDetections:
    """Controller update + per-cell top-k from the KERNEL's 2x2-pooled
    winner maps (`fast_kernel.fast_detect_grid_pallas`: per-block
    winner score + sub-position code, 0 = empty block; counts exact).

    The full-res response map never existed in HBM, so selection only
    traverses the 4x-smaller pooled maps.  Pooling runs on the GLOBAL
    even grid, so when a cell boundary is odd a boundary corner may
    occupy the neighbouring cell's capacity slot (its coordinates stay
    exact); with even cell dims the selected set is identical to the
    XLA path's (tested in interpret mode)."""
    Gr, Gc = cfg.grid_rows, cfg.grid_cols
    ch, cw = _cell_dims(H, W, cfg)

    err = counts.astype(jnp.float32) - cfg.cell_set_points()
    move = jnp.abs(err) > cfg.hysteresis * cfg.cell_set_points()
    delta = jnp.where(err > 0, 1.0, -1.0) * move
    new_t = jnp.clip(thresholds + delta, cfg.min_threshold,
                     cfg.max_threshold)

    H2, W2 = pooled.shape[-2:]
    # per-cell pooled regions: a NON-OVERLAPPING partition of the pooled
    # grid — floor bounds everywhere, ceil only on the final cell so the
    # last odd row/col is covered.  (The first cut used ceil on every
    # upper bound, which DUPLICATED the straddling pooled row/col into
    # both neighbouring cells at odd cell dims: the duplicate consumed
    # top-k capacity and silently dropped the weakest real corners —
    # caught by the parity fuzz, seed 15.)  Static Python loop over the
    # Gr*Gc cells; flat arrays padded to a common length.
    cell_s, cell_c, cell_meta = [], [], []
    maxlen = 0
    for gr in range(Gr):
        r0 = (gr * ch) // 2
        r1 = (min(-(-((gr + 1) * ch) // 2), H2) if gr == Gr - 1
              else ((gr + 1) * ch) // 2)
        for gc in range(Gc):
            c0 = (gc * cw) // 2
            c1 = (min(-(-((gc + 1) * cw) // 2), W2) if gc == Gc - 1
                  else ((gc + 1) * cw) // 2)
            cell_s.append(pooled[r0:r1, c0:c1].reshape(-1))
            cell_c.append(code[r0:r1, c0:c1].reshape(-1))
            cell_meta.append((r0, c0, r1 - r0, c1 - c0))
            maxlen = max(maxlen, (r1 - r0) * (c1 - c0))
    cells = jnp.stack([
        jnp.pad(a, (0, maxlen - a.shape[0]), constant_values=0.0)
        for a in cell_s])                           # (Gr*Gc, maxlen)
    codes = jnp.stack([
        jnp.pad(a, (0, maxlen - a.shape[0]), constant_values=0.0)
        for a in cell_c])

    k = cfg.cell_capacity
    score, idx = _topk_2stage(cells, k, cfg.chunk_size, cfg.chunk_topk)
    wcode = jnp.take_along_axis(codes, idx, axis=-1)
    sub_y = jnp.floor(wcode / 2.0)
    sub_x = wcode - sub_y * 2.0

    pw_cells = jnp.asarray([m[3] for m in cell_meta], jnp.int32)
    r0s = jnp.asarray([m[0] for m in cell_meta], jnp.int32)
    c0s = jnp.asarray([m[1] for m in cell_meta], jnp.int32)
    pyc = idx // pw_cells[:, None] + r0s[:, None]   # global pooled row
    pxc = idx % pw_cells[:, None] + c0s[:, None]
    ys = (2 * pyc).astype(jnp.float32) + sub_y
    xs = (2 * pxc).astype(jnp.float32) + sub_x
    ys = jnp.minimum(ys, H - 1.0).reshape(-1)
    xs = jnp.minimum(xs, W - 1.0).reshape(-1)
    score = score.reshape(-1)
    valid = score > 0

    kps = Keypoints(
        xy=jnp.stack([xs, ys], -1),
        score=score,
        angle=jnp.zeros_like(score),
        valid=valid)
    return GridDetections(keypoints=kps, thresholds=new_t,
                          cell_counts=counts)


def _use_fused_grid_kernel(cfg: GridConfig, *arrays) -> bool:
    """The fused detect+pool+count kernel needs the real TPU backend
    (same policy as fast.detect_dense), even kernel tiles (always true
    for the 128x256 default), and a grid that fits the kernel's static
    per-tile count register (one (8, 128) VREG: Gr <= 8, Gc <= 128 —
    `fast_kernel.fast_detect_grid_pallas` asserts this).  Oversized
    grids fall back to the XLA map path instead of failing the trace."""
    from front_end_tpu.ops.fast import _is_batch_tracer
    return (jax.default_backend() == "tpu"
            and cfg.grid_rows <= 8 and cfg.grid_cols <= 128
            and not any(_is_batch_tracer(jnp.asarray(a))
                        for a in arrays))


def detect_pair(left, right, tl, tr, cfg: GridConfig):
    """Stereo pair convenience: batch L/R through one program (the
    reference ran them on separate threads — here they share one fused
    kernel launch)."""
    H, W = left.shape[-2:]
    imgs = jnp.stack([left, right])
    tmaps = jnp.stack([threshold_image(tl, H, W, cfg),
                       threshold_image(tr, H, W, cfg)])
    ch, cw = _cell_dims(H, W, cfg)
    if _use_fused_grid_kernel(cfg, imgs, tmaps):
        # one kernel emits the pooled winner maps + exact counts; the
        # (H, W) response map never reaches HBM
        from front_end_tpu.ops.pallas import fast_kernel
        pooled, code, counts = fast_kernel.fast_detect_grid_pallas(
            imgs, tmaps, cfg.fast_type, nms=True,
            cell=(cfg.grid_rows, cfg.grid_cols, ch, cw))
        det = jax.vmap(lambda p, c, n, t: _select_from_pooled(
            p, c, n, t, cfg, H, W))(pooled, code, counts,
                                    jnp.stack([tl, tr]))
    else:
        # margins on the (2, H, W) stack BEFORE the vmap: the Pallas
        # FAST kernel launches once for the pair (cannot batch in vmap)
        smaps = fast_mod.detect_dense(imgs, tmaps, cfg.fast_type,
                                      nms=True)
        ts = jnp.stack([tl, tr])
        det = jax.vmap(lambda s, t: _detect_from_map(s, t, cfg))(smaps, ts)
    left_det = jax.tree.map(lambda a: a[0], det)
    right_det = jax.tree.map(lambda a: a[1], det)
    return left_det, right_det
