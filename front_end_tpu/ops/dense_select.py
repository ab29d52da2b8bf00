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
