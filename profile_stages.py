"""Per-stage on-chip timing of the VO pipeline at bench settings."""
import sys
import time

from front_end_tpu.utils import cache as _cache
_cache.enable()

import jax
import jax.numpy as jnp
import numpy as np

ONLY = set(sys.argv[1:])  # stage name prefixes to run; empty = all

from bench import make_sequence
from front_end_tpu.geometry.camera import kitti_rig
from front_end_tpu.ops import brief as brief_mod
from front_end_tpu.ops import fast as fast_mod
from front_end_tpu.ops import grid as grid_mod
from front_end_tpu.ops import match as match_mod
from front_end_tpu.pipeline import vo
from front_end_tpu.types import Descriptors
from front_end_tpu.utils import stagetime

rig = kitti_rig()
cfg = vo.VOConfig(
    grid=grid_mod.GridConfig(grid_rows=2, grid_cols=3, cell_capacity=384,
                             set_point=2000, init_threshold=15.0),
    desc_bytes=32, ransac_hyps=256, ransac_threshold=0.5,
    max_disparity=192.0, min_track_inliers=12)

lefts, rights = make_sequence(4, h=rig.height, w=rig.width)
L = jax.device_put(jnp.asarray(lefts[0]))
R = jax.device_put(jnp.asarray(rights[0]))
state = vo.init_state(rig, cfg)


def _sync(out):
    """Fetch one scalar element of the first leaf: on the remote-TPU
    backend `block_until_ready` can return while work is still queued
    (see bench._sync) — only a real device->host fetch proves the chain
    executed.  The tiny dependent slice forces the producer to finish
    while transferring only bytes."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[0])


def bench_fn(name, fn, *args, n=30):
    """On-chip per-iteration time via the shared scan-amortized harness
    (`front_end_tpu/utils/stagetime.py` — one implementation for this
    file and bench.py's stage_ms, see its module doc for the dispatch-
    floor and DCE-tap rationale)."""
    if ONLY and not any(name.startswith(p) for p in ONLY):
        return None
    dt, tc = stagetime.stage_ms(fn, *args, n=n, sync=_sync)
    print(f"{name:34s} {dt:7.3f} ms   (compile {tc:.1f}s)", flush=True)
    return jax.jit(fn)(*args)


# the harness's own per-iteration floor: a trivial op still measures
# ~0.5 ms/iter on this rig — read every stage below NET of this line
bench_fn("harness floor (trivial op)", lambda x: x + 1.0,
         np.zeros(8, np.float32))

# whole step
bench_fn("vo_step (total)", lambda s, l, r: vo.vo_step(s, l, r, rig, cfg),
         state, L, R)

# stage 1: score map both images
imgs = jnp.stack([L, R])
bench_fn("fast_score_map (pair)", lambda im: jax.vmap(
    lambda x: fast_mod.fast_score_map(x, cfg.grid.fast_type))(im), imgs)

ts = jnp.stack([state.thresholds_l, state.thresholds_r])
bench_fn("detect_dense thresh+nms (pair)", lambda im, t: jax.vmap(
    lambda x, tt: fast_mod.detect_dense(
        x, grid_mod.threshold_image(tt, rig.height, rig.width, cfg.grid),
        cfg.grid.fast_type))(im, t), imgs, ts)

det = jax.jit(lambda l, r, tl, tr: grid_mod.detect_pair(
    l, r, tl, tr, cfg.grid))(L, R, state.thresholds_l, state.thresholds_r)
bench_fn("detect_pair (grid full)",
         lambda l, r, tl, tr: grid_mod.detect_pair(l, r, tl, tr, cfg.grid),
         L, R, state.thresholds_l, state.thresholds_r)
detl, detr = det
kl, kr = detl.keypoints, detr.keypoints

sml = brief_mod.smooth(L)
bench_fn("brief smooth (pair)", lambda im: jax.vmap(brief_mod.smooth)(im), imgs)

from front_end_tpu.ops.pallas import brief_kernel
smr = brief_mod.smooth(R)
dl, dr = jax.jit(lambda a, b, x, y: brief_kernel.describe_pair_pallas(
    a, b, x, y, cfg.desc_bytes))(sml, smr, kl.xy, kr.xy)
bench_fn("brief describe_pair_pallas",
         lambda a, b, x, y: brief_kernel.describe_pair_pallas(
             a, b, x, y, cfg.desc_bytes),
         sml, smr, kl.xy, kr.xy)

bench_fn("stereo_match_live",
         lambda kl, dl, kr, dr: match_mod.stereo_match_live(
             kl, dl, kr, dr, epi_threshold=cfg.epi_threshold,
             max_disparity=cfg.max_disparity),
         kl, dl, kr, dr)

feats = jax.jit(lambda l, r, tl, tr: vo._extract_frame(
    l, r, tl, tr, rig, cfg))(L, R, state.thresholds_l, state.thresholds_r)[0]
bench_fn("_extract_frame (stages 1-5)",
         lambda l, r, tl, tr: vo._extract_frame(l, r, tl, tr, rig, cfg),
         L, R, state.thresholds_l, state.thresholds_r)

key = jax.random.PRNGKey(0)
bench_fn("interframe_match",
         lambda ck, cb, pk, pb: match_mod.interframe_match(
             ck, Descriptors(bits=cb), pk, Descriptors(bits=pb),
             box=cfg.track_box, ratio=cfg.lowe_ratio),
         feats.kps, feats.bits, feats.kps, feats.bits)

bench_fn("_estimate_motion (stages 6-7)",
         lambda k, c, p: vo._estimate_motion(k, c, p, rig, cfg),
         key, feats, feats)
