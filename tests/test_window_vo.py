"""Live windowed VO: tracker + windowed BA wired into the frame loop.

The reference runs its window path continuously (`bin/window_node` at
10 Hz; `WindowMatcher::newStereo` per frame); these tests assert the TPU
pipeline's windowed mode (a) runs BA inside the jit step, (b) keeps the
landmark store tracking across frames, and (c) does not lose to the
plain frame-to-frame pipeline on a noisy sequence.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from front_end_tpu.geometry.camera import StereoRig
from front_end_tpu.ops import grid
from front_end_tpu.pipeline import vo, window_vo

from test_pipeline import make_planar_sequence, _rig, _cfg


def _noisy_sequence(n_frames=8, sigma=4.0, seed=9):
    """Planar sequence + INDEPENDENT per-frame pixel noise — the
    measurement corruption that frame-to-frame integration accumulates
    and a 3-frame window averages out."""
    lefts, rights = make_planar_sequence(n_frames=n_frames)
    rs = np.random.RandomState(seed)
    lefts = np.clip(lefts + rs.normal(0, sigma, lefts.shape), 0, 255)
    rights = np.clip(rights + rs.normal(0, sigma, rights.shape), 0, 255)
    return lefts.astype(np.float32), rights.astype(np.float32)


def _gt_positions(n_frames, shift=2, disp=10):
    Z = 200.0 * 0.5 / disp
    dx = shift * Z / 200.0
    return np.stack([[dx * t, 0.0, 0.0] for t in range(n_frames)])


class TestWindowVO:
    def test_ba_runs_live_and_tracks(self):
        lefts, rights = make_planar_sequence(n_frames=6)
        rig, vcfg = _rig(), _cfg()
        cfg = window_vo.WindowVOConfig.create(vcfg, window=3, ba_every=1)
        state = window_vo.init_state(rig, cfg)
        step = jax.jit(
            lambda s, l, r: window_vo.window_vo_step(s, l, r, rig, cfg))
        outs = []
        for t in range(6):
            state, out = step(state, jnp.asarray(lefts[t]),
                              jnp.asarray(rights[t]))
            outs.append(out)

        # landmark store associates most features after frame 0
        assert all(int(o.n_tracked) > 100 for o in outs[1:])
        # BA kicks in once the window is full, every frame after
        assert not bool(outs[0].ba_ran)
        assert all(bool(o.ba_ran) for o in outs[2:])
        assert all(np.isfinite(float(o.ba_cost)) for o in outs[2:])
        assert all(float(o.ba_rms_px) < 1.0 for o in outs[2:])

        # trajectory: matches ground truth like the plain pipeline does
        gt = _gt_positions(6)
        p = np.stack([np.asarray(o.frame.pose)[:3, 3] for o in outs])
        np.testing.assert_allclose(
            p[:, 0], gt[:, 0] + (p[0, 0] - gt[0, 0]), atol=0.05)

    def test_window_beats_frame_to_frame(self):
        """On a noisy sequence the BA-refined trajectory must BEAT pure
        frame-to-frame integration — the flagship feature's value
        proposition, demanded (not just 'not worse'): with the top-K
        observation-count landmark selection the measured ratios across
        seeds 9-12 are 0.55-0.90."""
        n = 8
        lefts, rights = _noisy_sequence(n_frames=n)
        rig, vcfg = _rig(), _cfg()
        gt = _gt_positions(n)

        # plain VO
        s0 = vo.init_state(rig, vcfg)
        pstep = jax.jit(lambda s, l, r: vo.vo_step(s, l, r, rig, vcfg))
        plain = []
        for t in range(n):
            s0, out = pstep(s0, jnp.asarray(lefts[t]),
                            jnp.asarray(rights[t]))
            plain.append(np.asarray(out.pose)[:3, 3])
        plain = np.stack(plain)

        cfg = window_vo.WindowVOConfig.create(vcfg, window=3, ba_every=1)
        s1 = window_vo.init_state(rig, cfg)
        wstep = jax.jit(
            lambda s, l, r: window_vo.window_vo_step(s, l, r, rig, cfg))
        win = []
        for t in range(n):
            s1, out = wstep(s1, jnp.asarray(lefts[t]),
                            jnp.asarray(rights[t]))
            win.append(np.asarray(out.frame.pose)[:3, 3])
        win = np.stack(win)

        ate_plain = np.sqrt(np.mean(np.sum((plain - gt) ** 2, -1)))
        ate_win = np.sqrt(np.mean(np.sum((win - gt) ** 2, -1)))
        # a measured WIN (worst observed seed ratio 0.90; 0.97 absorbs
        # platform noise without ever accepting a loss)
        assert ate_win <= ate_plain * 0.97, (ate_win, ate_plain)
        # both must actually track (sanity floor)
        assert ate_win < 0.2, ate_win

    def test_long_window_scales(self):
        """The long-axis scaling claim (SURVEY §5): the window length is
        a config, not a constant — a 6-frame window (2x the reference's
        hard-coded 3, `front_end_window_node.cpp:6`) must run the same
        jitted step, fill all 6 pose slots and refine with finite cost."""
        lefts, rights = make_planar_sequence(n_frames=8)
        rig, vcfg = _rig(), _cfg()
        cfg = window_vo.WindowVOConfig.create(vcfg, window=6, ba_every=2,
                                              ba_iters=2)
        state = window_vo.init_state(rig, cfg)
        assert state.win.poses.shape == (6, 4, 4)
        step = jax.jit(
            lambda s, l, r: window_vo.window_vo_step(s, l, r, rig, cfg))
        outs = []
        for t in range(8):
            state, out = step(state, jnp.asarray(lefts[t]),
                              jnp.asarray(rights[t]))
            outs.append(out)
        assert bool(np.asarray(state.win.pose_valid).all())
        ran = [bool(o.ba_ran) for o in outs]
        assert any(ran[6:])                  # BA ran once window filled
        last_ba = [o for o in outs if bool(o.ba_ran)][-1]
        assert np.isfinite(float(last_ba.ba_cost))
        assert float(last_ba.ba_rms_px) < 1.0

    def test_run_sequence_scan(self):
        lefts, rights = make_planar_sequence(n_frames=5)
        rig, vcfg = _rig(), _cfg()
        cfg = window_vo.WindowVOConfig.create(vcfg, window=3, ba_every=2)
        state = window_vo.init_state(rig, cfg)
        f = jax.jit(lambda s, ls, rs_: window_vo.run_sequence(
            s, ls, rs_, rig, cfg))
        final, outs = f(state, jnp.asarray(lefts), jnp.asarray(rights))
        assert outs.frame.pose.shape == (5, 4, 4)
        assert bool(np.asarray(outs.ba_ran).any())
        # ba_every=2: BA must NOT run every frame
        ran = np.asarray(outs.ba_ran)
        assert ran.sum() < 5
