"""No jit-captured device-array constants — a transfer-bandwidth guard.

On the remote-TPU (axon) backend, executing ANY jitted program that
closed over a device-committed jax.Array as a constant (even a 16-element
arange) permanently degrades subsequent host->device transfers in the
process by ~100x (measured: 1.5 ms -> 200+ ms for a 3.7 MB put).  The VO
pipeline's feed throughput collapsed from 250 fps to 9 fps this way in
round 3: `StereoRig` carried jnp scalars and is closed over by every
pipeline jit.

The rule this suite enforces: closure constants reaching XLA must be
host-side (numpy / Python scalars), which fold into the executable as
literals; everything device-resident must flow in as an argument.  The
check is mechanical — trace the real entry points with jax.make_jaxpr
and inspect `jaxpr.consts` — so a regression anywhere in the stack
(a module-level jnp table, an eagerly-committed rig field, a cached
device pattern) fails here on CPU without TPU hardware.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from front_end_tpu.geometry.camera import kitti_rig
from front_end_tpu.ops import grid as grid_mod
from front_end_tpu.pipeline import vo, window_vo


def _device_consts(closed_jaxpr):
    """All captured constants that are committed jax Arrays (recursively
    through closed sub-jaxprs of scan/cond/while/pjit)."""
    bad = []
    seen = set()

    def walk(jaxpr, consts):
        for c in consts:
            if isinstance(c, jax.Array) and not isinstance(c, np.ndarray):
                bad.append((c.shape, c.dtype))
        for eqn in jaxpr.eqns:
            for v in eqn.params.values():
                sub = []
                if hasattr(v, "jaxpr") and hasattr(v, "consts"):
                    sub = [v]
                elif isinstance(v, (list, tuple)):
                    sub = [x for x in v
                           if hasattr(x, "jaxpr") and hasattr(x, "consts")]
                for s in sub:
                    key = id(s)
                    if key not in seen:
                        seen.add(key)
                        walk(s.jaxpr, s.consts)

    walk(closed_jaxpr.jaxpr, closed_jaxpr.consts)
    return bad


def _assert_clean(fn, *args):
    closed = jax.make_jaxpr(fn)(*args)
    bad = _device_consts(closed)
    assert not bad, (
        f"jit closure captured {len(bad)} device-array constant(s) "
        f"{bad[:5]} — these poison H2D bandwidth on the axon backend; "
        "use numpy for closure constants or pass the array as an argument")


@pytest.fixture(scope="module")
def rig():
    return kitti_rig()


@pytest.fixture(scope="module")
def cfg():
    return vo.VOConfig(
        grid=grid_mod.GridConfig(grid_rows=2, grid_cols=3,
                                 cell_capacity=128, set_point=500,
                                 init_threshold=15.0),
        desc_bytes=32, ransac_hyps=64)


def test_rig_fields_are_host_arrays(rig):
    for name in ("fx", "fy", "cx", "cy", "baseline"):
        v = getattr(rig, name)
        assert not (isinstance(v, jax.Array)
                    and not isinstance(v, np.ndarray)), (
            f"StereoRig.{name} is a device array — must be numpy")


def test_vo_step_captures_no_device_consts(rig, cfg):
    state = vo.init_state(rig, cfg)
    left = jnp.zeros((rig.height, rig.width), jnp.float32)
    _assert_clean(lambda s, l, r: vo.vo_step(s, l, r, rig, cfg),
                  state, left, left)


def test_window_vo_step_captures_no_device_consts(rig, cfg):
    wcfg = window_vo.WindowVOConfig.create(cfg, window=3, ba_every=1,
                                           ba_iters=2)
    state = window_vo.init_state(rig, wcfg)
    left = jnp.zeros((rig.height, rig.width), jnp.float32)
    _assert_clean(
        lambda s, l, r: window_vo.window_vo_step(s, l, r, rig, wcfg),
        state, left, left)


def test_graft_entry_captures_no_device_consts():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    _assert_clean(fn, *args)
