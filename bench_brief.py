"""Compare BRIEF descriptor strategies on the real TPU at bench shapes."""
import time

from front_end_tpu.utils import cache as _cache
_cache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_sequence
from front_end_tpu.geometry.camera import kitti_rig
from front_end_tpu.ops import brief as brief_mod
from front_end_tpu.ops import grid as grid_mod
from front_end_tpu.ops import image as image_ops
from front_end_tpu.ops.brief import _brief_pattern_np, PATCH
from front_end_tpu.pipeline import vo

rig = kitti_rig()
cfg = grid_mod.GridConfig(grid_rows=2, grid_cols=3, cell_capacity=384,
                          set_point=2000, init_threshold=15.0)
lefts, rights = make_sequence(2, h=rig.height, w=rig.width)
L = jax.device_put(jnp.asarray(lefts[0]))
R = jax.device_put(jnp.asarray(rights[0]))
ts = cfg.init_thresholds()

detl, detr = jax.jit(lambda l, r: grid_mod.detect_pair(l, r, ts, ts, cfg))(L, R)
xyl, xyr = detl.keypoints.xy, detr.keypoints.xy
N = xyl.shape[0]
n_bytes = 32
n_bits = 8 * n_bytes
print(f"N={N} keypoints, {n_bits} bits", flush=True)

pat = _brief_pattern_np(n_bits, PATCH, 7)          # (n_bits, 2, 2) int32
r = PATCH // 2                                      # 24
ia = (pat[:, 0, 1] + r) * PATCH + (pat[:, 0, 0] + r)   # flat patch idx A
ib = (pat[:, 1, 1] + r) * PATCH + (pat[:, 1, 0] + r)
Sa = np.zeros((PATCH * PATCH, n_bits), np.float32)
Sb = np.zeros((PATCH * PATCH, n_bits), np.float32)
Sa[ia, np.arange(n_bits)] = 1.0
Sb[ib, np.arange(n_bits)] = 1.0
Sa_j = jnp.asarray(Sa)
Sb_j = jnp.asarray(Sb)
ia_j = jnp.asarray(ia)
ib_j = jnp.asarray(ib)


def v_patch_matmul(sm, xy):
    P = image_ops.extract_patches(sm, xy, PATCH).reshape(-1, PATCH * PATCH)
    va = jax.lax.dot(P, Sa_j, precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    vb = jax.lax.dot(P, Sb_j, precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    return (va < vb).astype(jnp.float32)


def v_patch_take(sm, xy):
    P = image_ops.extract_patches(sm, xy, PATCH).reshape(-1, PATCH * PATCH)
    va = jnp.take(P, ia_j, axis=1)
    vb = jnp.take(P, ib_j, axis=1)
    return (va < vb).astype(jnp.float32)


def v_dense_xla(sm, xy):
    return brief_mod.describe_dense(sm, xy, n_bytes).bits


def v_gather(sm, xy):
    return brief_mod.describe(sm, xy, n_bytes).bits


def v_pallas(sml, smr, xl, xr):
    from front_end_tpu.ops.pallas import brief_kernel
    dl, dr = brief_kernel.describe_pair_pallas(sml, smr, xl, xr, n_bytes)
    return dl.bits, dr.bits


def timeit(name, fn, *args, n=30):
    f = jax.jit(fn)
    tc = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    tc = time.perf_counter() - tc
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:28s} {dt:7.3f} ms  (compile {tc:.1f}s)", flush=True)
    return out


# pair variants: run both images
def pair(fn):
    return lambda a, b, xl, xr: (fn(a, xl), fn(b, xr))


sml = jax.jit(brief_mod.smooth)(L)
smr = jax.jit(brief_mod.smooth)(R)
jax.block_until_ready(smr)

timeit("smooth (pair, box_blur)", lambda a, b: (brief_mod.smooth(a),
                                                brief_mod.smooth(b)), L, R)
out_mm = timeit("patch+matmul (pair)", pair(v_patch_matmul), sml, smr,
                xyl, xyr)
out_tk = timeit("patch+take (pair)", pair(v_patch_take), sml, smr, xyl, xyr)
out_dx = timeit("dense XLA bitplanes (pair)", pair(v_dense_xla), sml, smr,
                xyl, xyr)
out_pl = timeit("pallas rolls (pair)", v_pallas, sml, smr, xyl, xyr)
out_gt = timeit("naive gather (pair)", pair(v_gather), sml, smr, xyl, xyr)

# fused smooth+describe variants (what the pipeline would actually run)
timeit("smooth+patch_matmul (pair)",
       lambda a, b, xl, xr: (v_patch_matmul(brief_mod.smooth(a), xl),
                             v_patch_matmul(brief_mod.smooth(b), xr)),
       L, R, xyl, xyr)

# parity vs the gather reference (interior keypoints only)
ref_l = np.asarray(out_gt[0])
for name, out in (("matmul", out_mm), ("take", out_tk), ("denseXLA", out_dx),
                  ("pallas", out_pl)):
    got = np.asarray(out[0])
    valid = np.asarray(
        brief_mod.valid_mask(xyl, rig.width, rig.height))
    diff = (got[valid] != ref_l[valid]).mean() if valid.any() else 0.0
    print(f"parity {name:10s} bitdiff={diff:.6f}", flush=True)


def v_dense_padslice(sm, xy):
    """Pad ONCE, then every comparison is a pure slice of one buffer —
    XLA fuses slices (unlike pads) into the accumulate loop."""
    from front_end_tpu.types import unpack_bits
    H, W = sm.shape
    rr = r  # 24
    p = jnp.pad(sm, ((rr, rr), (rr, rr)), mode="edge")

    def view(dx, dy):
        return jax.lax.slice(p, (rr + dy, rr + dx), (rr + dy + H, rr + dx + W))

    words = []
    for w in range(n_bits // 32):
        acc = None
        for j in range(32):
            (axo, ayo), (bxo, byo) = pat[w * 32 + j]
            cmp = view(int(axo), int(ayo)) < view(int(bxo), int(byo))
            term = cmp.astype(jnp.uint32) << jnp.uint32(j)
            acc = term if acc is None else acc | term
        words.append(acc)
    planes = jnp.stack(words, -1)
    c = jnp.round(xy).astype(jnp.int32)
    px = jnp.clip(c[:, 0], 0, W - 1)
    py = jnp.clip(c[:, 1], 0, H - 1)
    packed = planes.reshape(-1, n_bits // 32)[py * W + px]
    return unpack_bits(packed)


out_ps = timeit("dense pad-once+slice (pair)", pair(v_dense_padslice),
                sml, smr, xyl, xyr)
got = np.asarray(out_ps[0])
valid = np.asarray(brief_mod.valid_mask(xyl, rig.width, rig.height))
print(f"parity padslice bitdiff={(got[valid] != ref_l[valid]).mean():.6f}",
      flush=True)

timeit("smooth+padslice (pair)",
       lambda a, b, xl, xr: (v_dense_padslice(brief_mod.smooth(a), xl),
                             v_dense_padslice(brief_mod.smooth(b), xr)),
       L, R, xyl, xyr)
