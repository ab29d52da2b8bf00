"""Measure per-dispatch overhead and scan-vs-python-loop throughput."""
import time

from front_end_tpu.utils import cache as _cache
_cache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_sequence
from front_end_tpu.geometry.camera import kitti_rig
from front_end_tpu.ops import grid as grid_mod
from front_end_tpu.pipeline import vo

# trivial op latency
x = jax.device_put(jnp.ones((8, 128)))
f = jax.jit(lambda a: a + 1)
f(x).block_until_ready()
t0 = time.perf_counter()
for _ in range(100):
    x = f(x)
x.block_until_ready()
print(f"trivial jit chain: {(time.perf_counter()-t0)/100*1e3:.3f} ms/call",
      flush=True)

rig = kitti_rig()
cfg = vo.VOConfig(
    grid=grid_mod.GridConfig(grid_rows=2, grid_cols=3, cell_capacity=384,
                             set_point=2000, init_threshold=15.0),
    desc_bytes=32, ransac_hyps=256, ransac_threshold=0.5,
    max_disparity=192.0, min_track_inliers=12)

n = 40
lefts, rights = make_sequence(n, h=rig.height, w=rig.width)
L = jax.device_put(jnp.asarray(lefts))
R = jax.device_put(jnp.asarray(rights))
jax.block_until_ready(R)

state = vo.init_state(rig, cfg)
step = jax.jit(lambda s, l, r: vo.vo_step(s, l, r, rig, cfg))
for t in range(2):
    state, out = step(state, L[t], R[t])
jax.block_until_ready(out.pose)

t0 = time.perf_counter()
for t in range(n):
    state, out = step(state, L[t], R[t])
jax.block_until_ready(out.pose)
dt = time.perf_counter() - t0
print(f"python loop: {dt/n*1e3:.3f} ms/frame = {n/dt:.1f} fps", flush=True)

# scan over the whole sequence on-device
seq = jax.jit(lambda s, ls, rs: vo.run_sequence(s, ls, rs, rig, cfg))
s2 = vo.init_state(rig, cfg)
tc = time.perf_counter()
out2 = seq(s2, L, R)
jax.block_until_ready(out2[1].pose)
print(f"scan compile {time.perf_counter()-tc:.1f}s", flush=True)
t0 = time.perf_counter()
out2 = seq(s2, L, R)
jax.block_until_ready(out2[1].pose)
dt2 = time.perf_counter() - t0
print(f"lax.scan:    {dt2/n*1e3:.3f} ms/frame = {n/dt2:.1f} fps", flush=True)
