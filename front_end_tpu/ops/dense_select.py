"""Gather/scatter-free row selection for the TPU hot path.

Measured on the v5e: a single 2304-element 1D gather or scatter-min
costs ~0.87 ms — the lowering serializes — while a fused dense
compare+reduce or a one-hot MXU matmul over the same virtual (N, M)
space costs tens of microseconds.  Every hot-path `X[idx]` /
`.at[idx].min()` goes through these instead:

- `take_rows(X, idx)`   == X[idx]        (one-hot matmul on the MXU)
- `segment_min(v, seg, n)`  per-segment min (dense compare+reduce)
- `lookup(table, idx)`  == table[idx] for (n,) tables (dense compare)

Exactness: the one-hot factor is exact {0,1}; a dot whose rows contain
exactly one nonzero adds true zeros in f32, so results are bit-identical
to the gather.  Off-TPU the plain indexed forms are used (XLA CPU/GPU
gathers are fine).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = 1e9


def _dense_ok(*arrays) -> bool:
    from front_end_tpu.ops.fast import _is_batch_tracer
    return (jax.default_backend() == "tpu"
            and not any(_is_batch_tracer(jnp.asarray(a)) for a in arrays))


def take_rows(X, idx):
    """X: (M, ...) -> X[idx] for (N,) int idx, no gather on TPU."""
    X = jnp.asarray(X)
    idx = jnp.asarray(idx)
    if not _dense_ok(X, idx) or X.ndim > 2:
        return X[idx]
    M = X.shape[0]
    oh = (idx[:, None] == jnp.arange(M)[None, :])
    squeeze = X.ndim == 1
    X2 = X[:, None] if squeeze else X
    # Precision.HIGHEST: the bit-identity claim above requires the f32
    # payload NOT to be rounded through bf16 MXU passes, independent of
    # any ambient default_matmul_precision at the call site (callers like
    # telemetry's stage harness jit these stages without the pipeline's
    # f32_precision pin; KITTI x-coords would round by up to ~4 px).
    # One-hot operands make the extra passes nearly free.
    if X2.dtype in (jnp.int32, jnp.bool_):
        out = jax.lax.dot_general(
            oh.astype(jnp.float32), X2.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32).astype(X2.dtype)
    else:
        out = jax.lax.dot_general(
            oh.astype(X2.dtype), X2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=X2.dtype)
    return out[:, 0] if squeeze else out


def lookup(table, idx):
    """table: (M,) -> table[idx] via dense select (any dtype)."""
    table = jnp.asarray(table)
    idx = jnp.asarray(idx)
    if not _dense_ok(table, idx):
        return table[idx]
    M = table.shape[0]
    eq = idx[:, None] == jnp.arange(M)[None, :]
    if table.dtype == jnp.bool_:
        return jnp.any(eq & table[None, :], axis=1)
    neutral = jnp.asarray(-BIG, table.dtype)
    return jnp.max(jnp.where(eq, table[None, :], neutral), axis=1)


def segment_min(vals, seg, n: int, fill=BIG):
    """min over i with seg[i]==t of vals[i], for t in [0, n).

    Replaces `.at[seg].min(vals)` (serial scatter on TPU) with one fused
    dense compare+reduce."""
    vals = jnp.asarray(vals)
    seg = jnp.asarray(seg)
    if not _dense_ok(vals, seg):
        return jnp.full((n,), fill, vals.dtype).at[seg].min(vals)
    eq = seg[:, None] == jnp.arange(n)[None, :]
    return jnp.min(jnp.where(eq, vals[:, None], fill), axis=0)


def topk_onehot(score, k: int, score_max: int):
    """Exact top-k selection WITHOUT sorting: (oh, mask, n_sel).

    For integer-VALUED f32 scores with valid entries in [1, score_max]
    and invalid entries <= 0.  The k-th-largest threshold is found by
    integer bisection (ceil(log2(score_max)) tiny compare+reduce passes
    over the M scores); ties at the threshold are broken by index order
    — the same selected SET as `lax.top_k` (which also prefers lower
    indices among equal values), delivered in INDEX order instead of
    score order.  `lax.top_k` over a few thousand elements costs ~0.9 ms
    on the v5e (sorting networks serialize); the bisection is ~16 cheap
    VPU reductions.

    Returns:
      oh:    (M, k) {0,1} f32 compaction matrix — column j holds the
             j-th selected row, so `oh.T @ X` compacts (K rows) and
             `oh @ Y` scatters K rows back to M slots; built ONCE and
             shared by every gather/scatter of one selection.
      mask:  (M,) bool — selected rows (== oh.any(axis=1)).
      n_sel: () int32 — min(k, #valid); oh columns >= n_sel are zero.
    """
    import math

    score = jnp.asarray(score, jnp.float32)
    M = score.shape[0]

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi + 1) // 2
        c = jnp.sum((score >= mid.astype(jnp.float32)).astype(jnp.int32))
        take = c >= k
        return (jnp.where(take, mid, lo), jnp.where(take, hi, mid - 1))

    iters = max(1, math.ceil(math.log2(score_max + 2)))
    lo, _ = jax.lax.fori_loop(
        0, iters, body, (jnp.int32(0), jnp.int32(score_max)))
    t = lo.astype(jnp.float32)
    gt = score > t
    n_gt = jnp.sum(gt.astype(jnp.int32))
    eq = (score == t) & (t > 0)
    rank_eq = jnp.cumsum(eq.astype(jnp.int32)) - 1
    mask = gt | (eq & (rank_eq < k - n_gt))
    n_sel = jnp.sum(mask.astype(jnp.int32))
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    oh = (mask[:, None]
          & (rank[:, None] == jnp.arange(k)[None, :])).astype(jnp.float32)
    return oh, mask, n_sel


def compact_rows(oh, X):
    """`oh.T @ X` for a `topk_onehot` matrix: (M, ...) -> (k, ...) rows
    in selection order, exact (one nonzero per oh column, HIGHEST
    precision — same bit-identity argument as `take_rows`)."""
    X = jnp.asarray(X)
    squeeze = X.ndim == 1
    X2 = X[:, None] if squeeze else X
    if X2.dtype in (jnp.int32, jnp.bool_):
        out = jax.lax.dot_general(
            oh, X2.astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32).astype(X2.dtype)
    else:
        out = jax.lax.dot_general(
            oh.astype(X2.dtype), X2,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=X2.dtype)
    return out[:, 0] if squeeze else out
