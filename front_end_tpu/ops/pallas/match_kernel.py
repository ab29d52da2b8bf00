"""Pallas TPU kernel: masked descriptor matching without the N² matrix.

The XLA matching engine (`ops/match.py`) materializes the full (N, N)
distance matrix plus its gate masks in HBM (~21 MB per pass at N=2304)
before reducing it to per-row/column minima — ~1 ms per match while the
actual MXU work is ~30 µs.  This kernel streams train-side tiles through
VMEM flash-attention style: the query descriptors stay resident, each
(N, TJ) distance tile is computed on the MXU, the epipolar / disparity /
ROI gates are evaluated in-register from the keypoint coordinates, and
only O(N) running reductions ever leave the chip:

  row_d1, row_i1  — best distance + argmin per query (first-wins ties)
  row_d2          — second-best EXCLUDING the argmin column (knn k=2)
  col_min, col_arg — best distance + arg per train (crossCheck)

Bit-exactness with the XLA path: {0,1} bf16 descriptor products and
their f32 accumulations are integers ≤ D, exact in ANY order, so the
Hamming distances are identical; all tie-breaks replicate argmin's
first-index-wins.  The `Matches` recipes (mutual / Lowe / uniqueness)
become O(N) vector epilogues in ops/match.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9
META_LANES = 128     # qmeta/tmeta padded lane width (layout alignment)


def _kernel(q_ref, t_ref, qm_ref, tm_ref,
            d1_ref, d2_ref, i1_ref, cmin_ref, carg_ref,
            sd1, sd2, si1, *, TJ, Nq, D, mode, p1, p2, p3):
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    # explicit DEFAULT precision: the VO pipeline runs under
    # default_matmul_precision("float32"), which Mosaic rejects for bf16
    # operands ("Bad lhs type"); bf16 products of {0,1} are exact anyway
    ab = jax.lax.dot_general(
        q_ref[:, :], t_ref[:, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)               # (Nq, TJ)
    sa = qm_ref[:, 3:4]                                   # |a| (Nq, 1)
    sb = tm_ref[3:4, :]                                   # |b| (1, TJ)
    dist = sa + sb - 2.0 * ab

    xq = qm_ref[:, 0:1]
    yq = qm_ref[:, 1:2]
    vq = qm_ref[:, 2:3]
    xt = tm_ref[0:1, :]
    yt = tm_ref[1:2, :]
    vt = tm_ref[2:3, :]
    ok = (vq > 0.5) & (vt > 0.5)
    if mode == "stereo":          # epi + disparity window (p1, p2, p3)
        ok &= jnp.abs(yq - yt) <= p1
        d = xq - xt
        ok &= (d >= p2) & (d <= p3)
    elif mode == "epi":           # epipolar only (p1)
        ok &= jnp.abs(yq - yt) <= p1
    elif mode == "roi":           # box gate (p1)
        ok &= (jnp.abs(xq - xt) <= p1) & (jnp.abs(yq - yt) <= p1)
    dist = jnp.where(ok, dist, BIG)

    lane = jax.lax.broadcasted_iota(jnp.int32, (Nq, TJ), 1)
    m1 = jnp.min(dist, axis=1, keepdims=True)             # (N, 1)
    a1l = jnp.min(jnp.where(dist == m1, lane, TJ), axis=1,
                  keepdims=True)                          # first-wins
    a1 = a1l + j * TJ
    m2 = jnp.min(jnp.where(lane == a1l, BIG, dist), axis=1,
                 keepdims=True)

    @pl.when(j == 0)
    def _init():
        sd1[:, :] = m1
        sd2[:, :] = m2
        si1[:, :] = a1

    @pl.when(j > 0)
    def _merge():
        d1o = sd1[:, :]
        d2o = sd2[:, :]
        i1o = si1[:, :]
        sd2[:, :] = jnp.minimum(jnp.minimum(d2o, m2),
                                jnp.maximum(d1o, m1))
        sd1[:, :] = jnp.minimum(d1o, m1)
        si1[:, :] = jnp.where(m1 < d1o, a1, i1o)

    sub = jax.lax.broadcasted_iota(jnp.int32, (Nq, TJ), 0)
    cm = jnp.min(dist, axis=0, keepdims=True)             # (1, TJ)
    cmin_ref[0:1, :] = cm
    carg_ref[0:1, :] = jnp.min(jnp.where(dist == cm, sub, Nq), axis=0,
                               keepdims=True)

    @pl.when(j == nj - 1)
    def _emit():
        d1_ref[:, :] = sd1[:, :]
        d2_ref[:, :] = sd2[:, :]
        i1_ref[:, :] = si1[:, :]


@functools.partial(jax.jit, static_argnames=("mode", "p1", "p2", "p3",
                                             "tile_j", "interpret"))
def match_reduce_pallas(bits_q, bits_t, xyq, xyt, valid_q, valid_t, *,
                        mode: str = "none", p1: float = 0.0,
                        p2: float = 0.0, p3: float = 0.0,
                        tile_j: int = 256, interpret: bool = False):
    """Streaming masked-Hamming match reductions.

    bits_*: (N, D) {0,1} float; xy*: (N, 2); valid_*: (N,) bool.
    mode/p1..p3: gate config — "stereo" (epi p1, disparity [p2, p3]),
    "epi" (p1), "roi" (box p1), "none".
    Returns (row_d1, row_d2, row_i1) of shape (Nq,) and
    (col_min, col_arg) of shape (Nt,).
    Nt must be a multiple of tile_j (pad with invalid rows otherwise).
    """
    Nq, D = bits_q.shape
    Nt = bits_t.shape[0]
    assert bits_t.shape[1] == D
    assert Nt % tile_j == 0, (Nt, tile_j)
    q = jnp.asarray(bits_q, jnp.bfloat16)
    t = jnp.asarray(bits_t, jnp.bfloat16)
    qm = jnp.zeros((Nq, META_LANES), jnp.float32)
    qm = qm.at[:, 0].set(xyq[:, 0]).at[:, 1].set(xyq[:, 1]) \
           .at[:, 2].set(valid_q.astype(jnp.float32)) \
           .at[:, 3].set(jnp.sum(jnp.asarray(bits_q, jnp.float32), -1))
    tm = jnp.zeros((8, Nt), jnp.float32)
    tm = tm.at[0].set(xyt[:, 0]).at[1].set(xyt[:, 1]) \
           .at[2].set(valid_t.astype(jnp.float32)) \
           .at[3].set(jnp.sum(jnp.asarray(bits_t, jnp.float32), -1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Nt // tile_j,),
        in_specs=[
            pl.BlockSpec((Nq, D), lambda j: (0, 0)),
            pl.BlockSpec((tile_j, D), lambda j: (j, 0)),
            pl.BlockSpec((Nq, META_LANES), lambda j: (0, 0)),
            pl.BlockSpec((8, tile_j), lambda j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((Nq, 1), lambda j: (0, 0)),
            pl.BlockSpec((Nq, 1), lambda j: (0, 0)),
            pl.BlockSpec((Nq, 1), lambda j: (0, 0)),
            pl.BlockSpec((1, tile_j), lambda j: (0, j)),
            pl.BlockSpec((1, tile_j), lambda j: (0, j)),
        ],
        scratch_shapes=[
            pltpu.VMEM((Nq, 1), jnp.float32),
            pltpu.VMEM((Nq, 1), jnp.float32),
            pltpu.VMEM((Nq, 1), jnp.int32),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_kernel, TJ=tile_j, Nq=Nq, D=D, mode=mode,
                          p1=p1, p2=p2, p3=p3),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Nq, 1), jnp.float32),
            jax.ShapeDtypeStruct((Nq, 1), jnp.float32),
            jax.ShapeDtypeStruct((Nq, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, Nt), jnp.float32),
            jax.ShapeDtypeStruct((1, Nt), jnp.int32),
        ],
        interpret=interpret,
    )(q, t, qm, tm)
    d1, d2, i1, cmin, carg = outs
    return (d1[:, 0], d2[:, 0], i1[:, 0], cmin[0], carg[0])
