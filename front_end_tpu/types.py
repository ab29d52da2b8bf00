"""Static-shaped data contracts — the framework's message layer.

Replaces the reference's ROS message zoo (`msg/kPoint.msg`, `msg/cvMatch.msg`,
`msg/stereoFeatures.msg`, `msg/stereoLandmarks.msg`) with pytree dataclasses.
The defining difference from the reference: every keypoint/descriptor/match
set is PADDED TO A STATIC CAPACITY with a validity mask, because XLA traces
fixed shapes.  Invalid rows carry finite garbage; consumers must mask.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Keypoints:
    """`msg/kPoint.msg` equivalent, struct-of-arrays, capacity N."""
    xy: jnp.ndarray        # (N, 2) float32 — x (col), y (row), subpixel
    score: jnp.ndarray     # (N,) float32 — detector response
    angle: jnp.ndarray     # (N,) float32 — radians, 0 if undefined
    valid: jnp.ndarray     # (N,) bool

    @property
    def capacity(self) -> int:
        return self.xy.shape[-2]

    @property
    def count(self):
        return jnp.sum(self.valid, axis=-1)

    @classmethod
    def empty(cls, n: int, batch=()):
        z = jnp.zeros(batch + (n,), jnp.float32)
        return cls(xy=jnp.zeros(batch + (n, 2), jnp.float32), score=z,
                   angle=z, valid=jnp.zeros(batch + (n,), bool))


@struct.dataclass
class Descriptors:
    """Binary descriptors in two layouts:

    - `bits`: (N, D) float32/bf16 in {0,1} — the MXU matching layout
      (Hamming = |a| + |b| − 2·a·bᵀ as one matmul);
    - `packed`: (N, D//32) uint32 — compact storage layout.
    Either may be None if not materialized.
    """
    bits: jnp.ndarray | None
    packed: jnp.ndarray | None = None

    @property
    def n_bits(self) -> int:
        if self.bits is not None:
            return self.bits.shape[-1]
        return self.packed.shape[-1] * 32


@struct.dataclass
class Matches:
    """`msg/cvMatch.msg` equivalent: per-query match rows, capacity Nq."""
    train_idx: jnp.ndarray   # (Nq,) int32 — matched train row (garbage if !valid)
    distance: jnp.ndarray    # (Nq,) float32
    valid: jnp.ndarray       # (Nq,) bool

    @property
    def count(self):
        return jnp.sum(self.valid, axis=-1)


def pack_bits(bits):
    """{0,1} (..., D) -> uint32 (..., D//32), bit j of word w = bit 32w+j."""
    bits = jnp.asarray(bits)
    d = bits.shape[-1]
    assert d % 32 == 0, "descriptor length must be a multiple of 32"
    b = bits.reshape(bits.shape[:-1] + (d // 32, 32)).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)


def unpack_bits(packed, dtype=jnp.float32):
    """uint32 (..., W) -> {0,1} (..., 32W)."""
    packed = jnp.asarray(packed)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    b = (packed[..., None] >> shifts) & jnp.uint32(1)
    return b.reshape(packed.shape[:-1] + (packed.shape[-1] * 32,)).astype(dtype)
