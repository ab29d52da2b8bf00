"""Control plane: runtime reset / reconfiguration.

The only RPC-shaped reference capabilities worth keeping (SURVEY §5):
- `controlDetection.srv` (`live_stereo.cpp:104-115`,
  `features.py:680-689`): re-seed the adaptive detector's set-point and
  thresholds at runtime, returning the applied set-point;
- the `windowMatching.srv` reset flag (`algorithm.py:772-778`): clear the
  sliding window / motion / track state.

Pure functions over the pipeline state pytrees — the caller (service
endpoint, notebook, CLI) owns transport.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


def control_detection(state, cfg, *, threshold: float, set_point: int):
    """Apply a `controlDetection` request to a `vo.VOState`.

    Returns (new_state, new_cfg, applied_set_point).  Thresholds are
    reset uniformly like `setDetectorThresholds` (`live_stereo.cpp:92-101`);
    the set-point lives in the (static) grid config, so a new cfg is
    returned — re-jit happens only when it actually changes.
    """
    new_grid = dataclasses.replace(cfg.grid, set_point=int(set_point),
                                   init_threshold=float(threshold))
    new_cfg = dataclasses.replace(cfg, grid=new_grid)
    t = jnp.full_like(state.thresholds_l, float(threshold))
    new_state = state._replace(thresholds_l=t, thresholds_r=t)
    return new_state, new_cfg, int(set_point)


def reset_window(tracker_state, tracker_cfg):
    """`windowMatching` reset: drop all landmarks, window poses and
    tracks (the reference clears its deque/graph)."""
    from front_end_tpu.window import tracker as tracker_mod
    return tracker_mod.init_state(tracker_cfg)


def reset_vo(rig, cfg, seed: int = 0):
    """Full front-end reset (fresh VOState)."""
    from front_end_tpu.pipeline import vo as vo_mod
    return vo_mod.init_state(rig, cfg, seed)
