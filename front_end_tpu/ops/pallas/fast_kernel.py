"""Pallas TPU kernel: dense FAST segment-test margins.

The XLA formulation (`ops/fast.py:fast_margins`) reads 16 shifted
full-image views plus the centre and then runs ~300 elementwise
min/max passes over full-image tensors — the VO profile shows it as the
single hottest stage (2.2 ms/pair at KITTI res, vs ~20 µs of actual HBM
traffic at speed of light).  This kernel tiles the image, DMAs each
(tile + halo) into VMEM ONCE, materializes the 16 circle taps as static
roll+slice pairs of the VMEM scratch, and runs the whole margin
reduction (arc windows, quick-rejection gates, border mask) on the VPU
without touching HBM again.  Output is the same (detect, score) margin
pair as `fast_margins` — bit-identical (same op order, f32).

cv2 semantics preserved exactly (see ops/fast.py module doc):
- score  = pure arc margin (max over contiguous-K windows of the
  per-class min), cv2 response + 1;
- detect = min(arc margin, quick-pair margin) per class for 12/8-point
  circles (the shared FAST_t quick-rejection gates), == score for 16;
- border rows/cols [0,3) and [size-3, size) forced to 0.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from front_end_tpu.ops.fast import TYPES

# Halos: circle radius is <= 3; sizes chosen so DMA slice shapes stay
# (8, 128)-tile aligned (same trick as brief_kernel.py).
HALO_Y = 8
HALO_X = 128


def _arc_margin(d, *, n, K):
    """max over circular starts s of min over the K-window of d — via
    sparse-table doubling: window mins of width 2^a are built by
    combining two half-width windows, and an arbitrary K-window is the
    min of two (overlapping) 2^a-windows.  min/max are associative and
    idempotent, so this reassociation is BIT-exact while cutting the
    naive n*(K-1) min passes (~128 for 9_16) to ~n*log2(K)+n (~80) —
    the kernel is VPU-compute-bound, so this is a direct speedup."""
    w = list(d)                      # window width 1
    width = 1
    while width * 2 <= K:
        w = [jnp.minimum(w[i], w[(i + width) % n]) for i in range(n)]
        width *= 2
    if width < K:                    # overlap-combine to exactly K
        w = [jnp.minimum(w[i], w[(i + K - width) % n]) for i in range(n)]
    best = w[0]
    for i in range(1, n):
        best = jnp.maximum(best, w[i])
    return best


def _quick_margin(d, *, n):
    """min over cv2's 8 quick-rejection pair tests (k, (k+8) mod n) of
    the pair max — the shared FAST_t gate for 12/8-point circles."""
    m = None
    for k in range(8):
        pair = jnp.maximum(d[k % n], d[(k + 8) % n])
        m = pair if m is None else jnp.minimum(m, pair)
    return m


def _kernel(img_ref, out_ref, scratch, sem, *, tile_h, tile_w, circle, K,
            H, W):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    copy = pltpu.make_async_copy(
        img_ref.at[b,
                   pl.ds(i * tile_h, tile_h + 2 * HALO_Y),
                   pl.ds(j * tile_w, tile_w + 2 * HALO_X)],
        scratch, sem)
    copy.start()
    copy.wait()

    h = tile_h + 2 * HALO_Y
    w = tile_w + 2 * HALO_X

    def tap(dx, dy):
        # static roll then aligned static slice (Mosaic needs 8-aligned
        # sublane slice starts; roll amounts are unrestricted)
        r = pltpu.roll(scratch[:, :], (-dy) % h, axis=0)
        r = pltpu.roll(r, (-dx) % w, axis=1)
        return r[HALO_Y:HALO_Y + tile_h, HALO_X:HALO_X + tile_w]

    center = scratch[HALO_Y:HALO_Y + tile_h, HALO_X:HALO_X + tile_w]
    n = len(circle)
    dark = [center - tap(dx, dy) for (dx, dy) in circle]    # p - c_i
    bright = [-d for d in dark]                              # c_i - p
    arc_margin = functools.partial(_arc_margin, n=n, K=K)

    quick_margin = functools.partial(_quick_margin, n=n)

    run_d = arc_margin(dark)
    run_b = arc_margin(bright)
    score = jnp.maximum(run_d, run_b)
    if n == 16:
        detect = score
    else:
        detect = jnp.maximum(jnp.minimum(run_d, quick_margin(dark)),
                             jnp.minimum(run_b, quick_margin(bright)))

    # cv2 border: rows/cols [3, size-4] of the FULL image (padded tiles
    # beyond H/W are masked off too)
    ys = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
          + i * tile_h)
    xs = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
          + j * tile_w)
    interior = ((ys >= 3) & (ys <= H - 4) & (xs >= 3) & (xs <= W - 4))
    zero = jnp.zeros_like(score)
    out_ref[0, 0, :, :] = jnp.where(interior, detect, zero)
    out_ref[0, 1, :, :] = jnp.where(interior, score, zero)


def _dma_tile_pair(img_ref, t_ref, scratch, tscr, sem, tsem, *, tile_h,
                   tile_w):
    """Start the image + threshold halo'd-tile DMAs; wait on the image
    copy (the threshold copy is returned still in flight so margin
    compute overlaps it)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    copy = pltpu.make_async_copy(
        img_ref.at[b,
                   pl.ds(i * tile_h, tile_h + 2 * HALO_Y),
                   pl.ds(j * tile_w, tile_w + 2 * HALO_X)],
        scratch, sem)
    copy.start()
    tcopy = pltpu.make_async_copy(
        t_ref.at[b,
                 pl.ds(i * tile_h, tile_h + 2 * HALO_Y),
                 pl.ds(j * tile_w, tile_w + 2 * HALO_X)],
        tscr, tsem)
    tcopy.start()
    copy.wait()
    return tcopy


def _nms_survivors(scratch, tscr, tcopy, *, tile_h, tile_w, circle, K,
                   H, W, nms):
    """The shared cv2-exactness-critical core of both fused kernels:
    FAST margins over the FULL halo'd scratch, quick-rejection gates,
    global-coordinate border mask, threshold gate, sparse 3x3 NMS.
    Returns the surviving-score map in the halo'd tile frame — exactly
    `fast.detect_dense` semantics (one implementation, so a margin or
    NMS tie-rule fix cannot diverge between the kernels)."""
    i = pl.program_id(1)
    j = pl.program_id(2)
    h = tile_h + 2 * HALO_Y
    w = tile_w + 2 * HALO_X
    full = scratch[:, :]

    def tap(src, dx, dy):
        r = pltpu.roll(src, (-dy) % h, axis=0)
        return pltpu.roll(r, (-dx) % w, axis=1)

    n = len(circle)
    dark = [full - tap(full, dx, dy) for (dx, dy) in circle]
    bright = [-d for d in dark]
    arc_margin = functools.partial(_arc_margin, n=n, K=K)

    quick_margin = functools.partial(_quick_margin, n=n)

    run_d = arc_margin(dark)
    run_b = arc_margin(bright)
    score = jnp.maximum(run_d, run_b)
    if n == 16:
        detect = score
    else:
        detect = jnp.maximum(jnp.minimum(run_d, quick_margin(dark)),
                             jnp.minimum(run_b, quick_margin(bright)))

    # global-coordinate border mask over the full scratch
    ys = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
          + i * tile_h - HALO_Y)
    xs = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
          + j * tile_w - HALO_X)
    interior = ((ys >= 3) & (ys <= H - 4) & (xs >= 3) & (xs <= W - 4))

    tcopy.wait()
    corner = (detect > tscr[:, :]) & interior
    s = jnp.where(corner, score, 0.0)
    if nms:
        neigh = None
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                v = tap(s, dx, dy)
                neigh = v if neigh is None else jnp.maximum(neigh, v)
        s = jnp.where(s > neigh, s, 0.0)
    return s


def _detect_kernel(img_ref, t_ref, out_ref, scratch, tscr, sem, tsem, *,
                   tile_h, tile_w, circle, K, H, W, nms):
    """Fused cv2-exact FAST: margins + threshold gate + sparse NMS, one
    HBM round-trip.  Margins are computed over the FULL halo'd scratch
    (compute is ~2% of the kernel's cost; fusing the NMS saves a whole
    image read+write) and the NMS compares the thresholded sparse
    responses, exactly like `fast.detect_dense`."""
    tcopy = _dma_tile_pair(img_ref, t_ref, scratch, tscr, sem, tsem,
                           tile_h=tile_h, tile_w=tile_w)
    s = _nms_survivors(scratch, tscr, tcopy, tile_h=tile_h,
                       tile_w=tile_w, circle=circle, K=K, H=H, W=W,
                       nms=nms)
    out_ref[0, :, :] = s[HALO_Y:HALO_Y + tile_h, HALO_X:HALO_X + tile_w]


@functools.partial(jax.jit, static_argnames=("fast_type", "nms", "tile_h",
                                             "tile_w", "interpret"))
def fast_detect_pallas(img, threshold, fast_type: str = "9_16",
                       nms: bool = True, *, tile_h: int = 128,
                       tile_w: int = 256, interpret: bool = False):
    """Fused `fast.detect_dense` on TPU: (B, H, W) or (H, W) image +
    same-shaped (or scalar) threshold -> surviving-corner response map,
    bit-identical to the XLA path."""
    circle, K = TYPES[fast_type]
    img = jnp.asarray(img, jnp.float32)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    B, H, W = img.shape
    tmap = jnp.broadcast_to(jnp.asarray(threshold, jnp.float32), img.shape)
    Hp = -(-H // tile_h) * tile_h
    Wp = -(-W // tile_w) * tile_w
    pad = ((0, 0), (HALO_Y, Hp - H + HALO_Y), (HALO_X, Wp - W + HALO_X))
    padded = jnp.pad(img, pad, mode="edge")
    tpadded = jnp.pad(tmap, pad, mode="edge")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, Hp // tile_h, Wp // tile_w),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, tile_h, tile_w),
                               lambda b, i, j: (b, i, j)),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * HALO_Y, tile_w + 2 * HALO_X),
                       jnp.float32),
            pltpu.VMEM((tile_h + 2 * HALO_Y, tile_w + 2 * HALO_X),
                       jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_detect_kernel, tile_h=tile_h, tile_w=tile_w,
                          circle=circle, K=K, H=H, W=W, nms=nms),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32),
        interpret=interpret,
    )(padded, tpadded)
    out = out[:, :H, :W]
    if squeeze:
        out = out[0]
    return out


def _detect_grid_kernel(img_ref, t_ref, pooled_ref, code_ref, cnt_ref,
                        scratch, tscr, sem, tsem, *, tile_h, tile_w,
                        circle, K, H, W, nms, Gr, Gc, ch, cw):
    """FAST margins + threshold + NMS + 2x2 winner pooling + per-cell
    survivor counts — the ENTIRE grid-detection front half in one HBM
    round-trip.  The full-res response map never reaches HBM: downstream
    selection reads the 4x-smaller pooled score map (plus a same-sized
    sub-position code map: sub_y*2 + sub_x of each block's winner) and
    the counts come out exact, so the XLA side never has to traverse a
    (H, W) map again (measured r5: every such traversal costs ~0.6 ms
    at KITTI res — more than this whole kernel)."""
    i = pl.program_id(1)
    j = pl.program_id(2)
    tcopy = _dma_tile_pair(img_ref, t_ref, scratch, tscr, sem, tsem,
                           tile_h=tile_h, tile_w=tile_w)
    s = _nms_survivors(scratch, tscr, tcopy, tile_h=tile_h,
                       tile_w=tile_w, circle=circle, K=K, H=H, W=W,
                       nms=nms)
    st = s[HALO_Y:HALO_Y + tile_h, HALO_X:HALO_X + tile_w]

    # ---- per-cell survivor counts (cropped to whole cells, like the
    # XLA path's smap[:Gr*ch, :Gc*cw]) ---------------------------------
    yt = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
          + i * tile_h)
    xt = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
          + j * tile_w)
    alive = st > 0.0
    cnt = jnp.zeros((8, 128), jnp.float32)
    for gr in range(Gr):
        for gc in range(Gc):
            in_cell = (alive
                       & (yt >= gr * ch) & (yt < (gr + 1) * ch)
                       & (xt >= gc * cw) & (xt < (gc + 1) * cw))
            c = jnp.sum(in_cell.astype(jnp.float32))
            ry = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            rx = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            cnt = jnp.where((ry == gr) & (rx == gc), c, cnt)
    cnt_ref[0, 0, :, :] = cnt

    # ---- 2x2 winner pool (tile dims even => blocks align with the
    # GLOBAL even grid).  Mosaic cannot lower strided slices/reshapes,
    # so deinterleaving rides one-hot compaction MATMULS (exact: one
    # nonzero per output row/col; precision HIGHEST keeps f32 scores
    # bit-exact) after roll-based pair maxima. --------------------------
    HI = jax.lax.Precision.HIGHEST
    colB = pltpu.roll(st, (-1) % tile_w, axis=1)   # value at c = st[c+1]
    mcol = jnp.maximum(st, colB)                   # even cols: pair max
    w1f = (colB > st).astype(jnp.float32)          # even cols: sub_x

    ic = jax.lax.broadcasted_iota(jnp.int32, (tile_w, tile_w // 2), 0)
    ij = jax.lax.broadcasted_iota(jnp.int32, (tile_w, tile_w // 2), 1)
    SC = (ic == 2 * ij).astype(jnp.float32)        # even-col selector
    mc = jax.lax.dot_general(mcol, SC, (((1,), (0,)), ((), ())),
                             precision=HI,
                             preferred_element_type=jnp.float32)
    w1c = jax.lax.dot_general(w1f, SC, (((1,), (0,)), ((), ())),
                              precision=HI,
                              preferred_element_type=jnp.float32)

    ir = jax.lax.broadcasted_iota(jnp.int32, (tile_h // 2, tile_h), 0)
    ik = jax.lax.broadcasted_iota(jnp.int32, (tile_h // 2, tile_h), 1)
    SEr = (ik == 2 * ir).astype(jnp.float32)       # even-row selector
    SOr = (ik == 2 * ir + 1).astype(jnp.float32)   # odd-row selector
    rA = jax.lax.dot_general(SEr, mc, (((1,), (0,)), ((), ())),
                             precision=HI,
                             preferred_element_type=jnp.float32)
    rB = jax.lax.dot_general(SOr, mc, (((1,), (0,)), ((), ())),
                             precision=HI,
                             preferred_element_type=jnp.float32)
    pooled = jnp.maximum(rA, rB)                   # (tile_h/2, tile_w/2)
    w2 = rB > rA
    w1A = jax.lax.dot_general(SEr, w1c, (((1,), (0,)), ((), ())),
                              precision=HI,
                              preferred_element_type=jnp.float32)
    w1B = jax.lax.dot_general(SOr, w1c, (((1,), (0,)), ((), ())),
                              precision=HI,
                              preferred_element_type=jnp.float32)
    sub_x = jnp.where(w2, w1B, w1A)
    pooled_ref[0, :, :] = pooled
    code_ref[0, :, :] = jnp.where(w2, 2.0, 0.0) + sub_x


@functools.partial(jax.jit, static_argnames=(
    "fast_type", "nms", "cell", "tile_h", "tile_w", "interpret"))
def fast_detect_grid_pallas(img, threshold, fast_type: str = "9_16",
                            nms: bool = True, *, cell,
                            tile_h: int = 128, tile_w: int = 256,
                            interpret: bool = False):
    """Fused grid-detection front half on TPU.

    cell = (Gr, Gc, ch, cw) static cell geometry.  Returns
    (pooled (B, Hp/2, Wp/2) score of each 2x2 block's winner (0 =
    empty), code (same shape; sub_y*2 + sub_x of the winner), counts
    (B, Gr, Gc) int32 exact per-cell post-NMS survivor counts).  The
    full-res response map is never written to HBM."""
    Gr, Gc, ch, cw = cell
    assert Gr <= 8 and Gc <= 128, (Gr, Gc)
    circle, K = TYPES[fast_type]
    img = jnp.asarray(img, jnp.float32)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    B, H, W = img.shape
    tmap = jnp.broadcast_to(jnp.asarray(threshold, jnp.float32), img.shape)
    Hp = -(-H // tile_h) * tile_h
    Wp = -(-W // tile_w) * tile_w
    pad = ((0, 0), (HALO_Y, Hp - H + HALO_Y), (HALO_X, Wp - W + HALO_X))
    padded = jnp.pad(img, pad, mode="edge")
    tpadded = jnp.pad(tmap, pad, mode="edge")

    NI, NJ = Hp // tile_h, Wp // tile_w
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, NI, NJ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, tile_h // 2, tile_w // 2),
                         lambda b, i, j: (b, i, j)),
            pl.BlockSpec((1, tile_h // 2, tile_w // 2),
                         lambda b, i, j: (b, i, j)),
            pl.BlockSpec((1, 1, 8, 128),
                         lambda b, i, j: (b, i * NJ + j, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * HALO_Y, tile_w + 2 * HALO_X),
                       jnp.float32),
            pltpu.VMEM((tile_h + 2 * HALO_Y, tile_w + 2 * HALO_X),
                       jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    pooled, code, cnt = pl.pallas_call(
        functools.partial(_detect_grid_kernel, tile_h=tile_h,
                          tile_w=tile_w, circle=circle, K=K, H=H, W=W,
                          nms=nms, Gr=Gr, Gc=Gc, ch=ch, cw=cw),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hp // 2, Wp // 2), jnp.float32),
            jax.ShapeDtypeStruct((B, Hp // 2, Wp // 2), jnp.float32),
            jax.ShapeDtypeStruct((B, NI * NJ, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(padded, tpadded)
    counts = jnp.sum(cnt, axis=1)[:, :Gr, :Gc].astype(jnp.int32)
    if squeeze:
        return pooled[0], code[0], counts[0]
    return pooled, code, counts


@functools.partial(jax.jit, static_argnames=("fast_type", "tile_h",
                                             "tile_w", "interpret"))
def fast_margins_pallas(img, fast_type: str = "9_16", *,
                        tile_h: int = 128, tile_w: int = 256,
                        interpret: bool = False):
    """(B, H, W) or (H, W) float32 -> (detect, score) margin maps,
    matching `ops/fast.fast_margins` bit-for-bit."""
    circle, K = TYPES[fast_type]
    img = jnp.asarray(img, jnp.float32)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    B, H, W = img.shape
    Hp = -(-H // tile_h) * tile_h
    Wp = -(-W // tile_w) * tile_w
    padded = jnp.pad(img, ((0, 0), (HALO_Y, Hp - H + HALO_Y),
                           (HALO_X, Wp - W + HALO_X)), mode="edge")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, Hp // tile_h, Wp // tile_w),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 2, tile_h, tile_w),
                               lambda b, i, j: (b, 0, i, j)),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * HALO_Y, tile_w + 2 * HALO_X),
                       jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, tile_w=tile_w,
                          circle=circle, K=K, H=H, W=W),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 2, Hp, Wp), jnp.float32),
        interpret=interpret,
    )(padded)
    out = out[:, :, :H, :W]
    if squeeze:
        out = out[0]
    return out[..., 0, :, :], out[..., 1, :, :]
