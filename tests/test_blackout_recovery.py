"""Failure recovery: the live pipeline must survive a camera blackout.

The reference's runtime fault tolerance is its gate stack — RANSAC /
Lowe / epipolar filters plus the `controlDetection` reset service
(SURVEY §5 'Failure detection').  The strongest live fault is total
signal loss: frames go black mid-sequence, every detector count drops
to ~0, matching produces nothing.  Required behavior, asserted here for
BOTH pipelines (plain and windowed BA):

  1. no NaN/Inf anywhere in carried state or outputs — ever;
  2. during the blackout motion_ok goes False and the pose FREEZES
     (identity motion), instead of integrating garbage;
  3. after frames return, tracking re-acquires within 2 frames and the
     trajectory resumes with correct per-frame motion;
  4. the adaptive thresholds recover (the controller drives them down
     during the blackout and back up after — they stay inside their
     clip range by construction).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from front_end_tpu.pipeline import vo, window_vo

from test_pipeline import make_planar_sequence, _rig, _cfg


def _blackout_sequence(n=10, dark=(4, 6)):
    lefts, rights = make_planar_sequence(n_frames=n)
    lefts, rights = lefts.copy(), rights.copy()
    for t in range(*dark):
        lefts[t] = 0.0
        rights[t] = 0.0
    return lefts, rights


def _assert_finite(tree, label):
    for leaf in jax.tree_util.tree_leaves(tree):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f":
            assert np.isfinite(arr).all(), label


class TestBlackoutRecovery:
    def test_plain_pipeline_freezes_and_reacquires(self):
        n, dark = 10, (4, 6)
        lefts, rights = _blackout_sequence(n, dark)
        rig, cfg = _rig(), _cfg()
        state = vo.init_state(rig, cfg)
        step = jax.jit(lambda s, l, r: vo.vo_step(s, l, r, rig, cfg))
        outs, poses = [], []
        for t in range(n):
            state, out = step(state, jnp.asarray(lefts[t]),
                              jnp.asarray(rights[t]))
            _assert_finite(state, f"state frame {t}")
            _assert_finite(out, f"out frame {t}")
            outs.append(out)
            poses.append(np.asarray(out.pose))

        # blackout frames (and the first frame after, which has no
        # usable predecessor) must not claim valid motion
        for t in list(range(*dark)) + [dark[1]]:
            assert not bool(outs[t].motion_ok), t
            np.testing.assert_allclose(np.asarray(outs[t].motion),
                                       np.eye(4), atol=1e-6)
        # pose frozen across the blackout
        np.testing.assert_allclose(poses[dark[1]], poses[dark[0] - 1],
                                   atol=1e-6)
        # re-acquired: the second frame after recovery tracks real motion
        for t in range(dark[1] + 1, n):
            assert bool(outs[t].motion_ok), t
            dx = poses[t][0, 3] - poses[t - 1][0, 3]
            np.testing.assert_allclose(dx, 0.1, atol=0.03)

    def test_windowed_pipeline_survives_blackout(self):
        n, dark = 10, (4, 6)
        lefts, rights = _blackout_sequence(n, dark)
        rig, vcfg = _rig(), _cfg()
        cfg = window_vo.WindowVOConfig.create(vcfg, window=3, ba_every=1,
                                              ba_iters=2)
        state = window_vo.init_state(rig, cfg)
        step = jax.jit(
            lambda s, l, r: window_vo.window_vo_step(s, l, r, rig, cfg))
        outs = []
        for t in range(n):
            state, out = step(state, jnp.asarray(lefts[t]),
                              jnp.asarray(rights[t]))
            _assert_finite(state, f"wstate frame {t}")
            _assert_finite(out, f"wout frame {t}")
            outs.append(out)
        # tracker re-populates after the blackout
        assert int(outs[-1].n_tracked) > 100
        # BA keeps producing finite refinements afterwards
        post = [o for o in outs[dark[1] + 1:] if bool(o.ba_ran)]
        assert post and all(np.isfinite(float(o.ba_cost)) for o in post)
