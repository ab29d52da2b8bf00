"""Pallas TPU kernel: dense BRIEF bitplanes.

The XLA formulation of dense BRIEF (`ops/brief.py:describe_dense`) emits
2·n_bits shifted full-image reads; at 512 bits that is ~1.8 GB of HBM
traffic per 376×1241 frame (~3 ms) even though the useful data is one
1.8 MB image.  This kernel tiles the image, DMAs each (tile + halo) into
VMEM ONCE, and evaluates every pattern comparison as a static in-VMEM
slice pair — HBM traffic drops to image + packed-bitplane size.

Output layout: (n_words, H, W) uint32 — word-major so the trailing two
dims stay lane-aligned image coordinates.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Halos around each tile.  The pattern needs 24 px; the column halo is
# widened to 64 so DMA slice shapes stay 128-lane aligned (Mosaic
# requirement), and the row halo stays 24 (8-sublane aligned: 128+48=176).
HALO_Y = 24
HALO_X = 64


def _kernel(offs_ref, img_ref, out_ref, scratch, sem, *, tile_h, tile_w):
    """offs_ref: scalar-prefetched (n_bits, 4) int32 [ax, ay, bx, by]."""
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

    def sample(dx, dy):
        # out[y, x] = scratch[y+dy+HALO_Y, x+dx+HALO_X]: dynamic rotates
        # (sublane/lane) followed by STATIC aligned slices — Mosaic
        # requires sublane slice starts provably 8-aligned, which a
        # traced dy cannot satisfy, but rotate amounts are unrestricted.
        h = tile_h + 2 * HALO_Y
        w = tile_w + 2 * HALO_X
        r = scratch[:, :]
        r = pltpu.roll(r, jnp.mod(-dy, h), axis=0)
        r = pltpu.roll(r, jnp.mod(-dx, w), axis=1)
        return r[HALO_Y:HALO_Y + tile_h, HALO_X:HALO_X + tile_w]

    n_words = out_ref.shape[1]

    def word_body(w, _):
        def bit_body(bit_i, acc):
            k = w * 32 + bit_i
            va = sample(offs_ref[k, 0], offs_ref[k, 1])
            vb = sample(offs_ref[k, 2], offs_ref[k, 3])
            bit = (va < vb).astype(jnp.uint32)
            return acc | (bit << bit_i.astype(jnp.uint32))

        acc = jax.lax.fori_loop(
            0, 32, bit_body, jnp.zeros((tile_h, tile_w), jnp.uint32))
        out_ref[0, w, :, :] = acc
        return 0

    jax.lax.fori_loop(0, n_words, word_body, 0)


@functools.partial(jax.jit, static_argnames=("n_bits", "pattern_seed",
                                             "tile_h", "tile_w",
                                             "interpret"))
def brief_bitplanes(img, n_bits: int = 256, pattern_seed: int = 7,
                    tile_h: int = 128, tile_w: int = 256,
                    interpret: bool = False):
    """(B, H, W) or (H, W) float32 smoothed image(s) ->
    (B, n_words, H, W) / (n_words, H, W) uint32 bitplanes.

    Bit-identical to the XLA dense path away from the border (edge
    padding semantics match `image.shift2d`).  A stereo pair should be
    passed as one (2, H, W) batch — one kernel launch covers both.
    """
    from front_end_tpu.ops.brief import _brief_pattern_np, PATCH

    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    pat = _brief_pattern_np(n_bits, PATCH, pattern_seed)   # (n_bits, 2, 2)
    offs = jnp.asarray(pat.reshape(n_bits, 4).astype(np.int32))
    B, H, W = img.shape
    n_words = n_bits // 32
    Hp = -(-H // tile_h) * tile_h
    Wp = -(-W // tile_w) * tile_w
    padded = jnp.pad(jnp.asarray(img, jnp.float32),
                     ((0, 0), (HALO_Y, Hp - H + HALO_Y),
                      (HALO_X, Wp - W + HALO_X)),
                     mode="edge")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hp // tile_h, Wp // tile_w),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, n_words, tile_h, tile_w),
                               lambda b, i, j, offs: (b, 0, i, j)),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * HALO_Y, tile_w + 2 * HALO_X),
                       jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, tile_w=tile_w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_words, Hp, Wp), jnp.uint32),
        interpret=interpret,
    )(offs, padded)
    out = out[:, :, :H, :W]
    return out[0] if squeeze else out


def _gather_words(planes, xy):
    from front_end_tpu.types import Descriptors, unpack_bits

    n_words, H, W = planes.shape
    c = jnp.round(jnp.asarray(xy)).astype(jnp.int32)
    px = jnp.clip(c[:, 0], 0, W - 1)
    py = jnp.clip(c[:, 1], 0, H - 1)
    packed = planes.reshape(n_words, -1)[:, py * W + px].T
    return Descriptors(bits=unpack_bits(packed), packed=packed)


def describe_dense_pallas(img_smooth, xy, n_bytes: int = 16, *,
                          pattern_seed: int = 7, interpret: bool = False):
    """Drop-in replacement for `brief.describe_dense` using the kernel."""
    planes = brief_bitplanes(img_smooth, 8 * n_bytes, pattern_seed,
                             interpret=interpret)      # (n_words, H, W)
    return _gather_words(planes, xy)


def describe_pair_pallas(sm_left, sm_right, xy_left, xy_right,
                         n_bytes: int = 16, *, pattern_seed: int = 7,
                         interpret: bool = False):
    """Stereo pair in ONE kernel launch -> (desc_left, desc_right)."""
    planes = brief_bitplanes(jnp.stack([sm_left, sm_right]), 8 * n_bytes,
                             pattern_seed, interpret=interpret)
    return (_gather_words(planes[0], xy_left),
            _gather_words(planes[1], xy_right))
