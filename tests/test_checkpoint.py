"""Checkpoint/resume tests — the serializeWindow capability
(`algorithm.py:119-143`) for the live pipeline states."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from front_end_tpu.geometry.camera import StereoRig
from front_end_tpu.ops import grid
from front_end_tpu.pipeline import vo, window_vo
from front_end_tpu.utils import checkpoint


def small_rig():
    return StereoRig.create(fx=120.0, cx=79.5, cy=59.5, baseline=0.4,
                            width=160, height=120)


def small_cfg():
    return vo.VOConfig(
        grid=grid.GridConfig(cell_capacity=64,
                             set_point=120, init_threshold=10.0),
        desc_bytes=16, ransac_hyps=64, ransac_threshold=0.3,
        max_disparity=48.0)


def make_frames(n, rig, seed=0):
    r = np.random.RandomState(seed)
    base = np.kron(r.uniform(30, 220, (15, 20)),
                   np.ones((8, 8))).astype(np.float32)
    L, R = [], []
    for i in range(n):
        shift = 2 * i
        l = np.roll(base, shift, axis=1)
        rr = np.roll(l, -6, axis=1)               # fixed disparity
        L.append(l + r.uniform(0, 2, l.shape))
        R.append(rr + r.uniform(0, 2, l.shape))
    return np.stack(L), np.stack(R)


class TestPytreeRoundTrip:
    def test_vo_state_round_trip(self, tmp_path):
        rig, cfg = small_rig(), small_cfg()
        s = vo.init_state(rig, cfg, seed=3)
        path = str(tmp_path / "vo_state.npz")
        n = checkpoint.save_pytree(path, s)
        assert n == len(jax.tree_util.tree_leaves(s))
        s2 = checkpoint.load_pytree(path, vo.init_state(rig, cfg))
        for a, b in zip(jax.tree_util.tree_leaves(s),
                        jax.tree_util.tree_leaves(s2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_shape_mismatch_rejected(self, tmp_path):
        rig, cfg = small_rig(), small_cfg()
        path = str(tmp_path / "s.npz")
        checkpoint.save_pytree(path, vo.init_state(rig, cfg))
        other = vo.VOConfig(
            grid=grid.GridConfig(cell_capacity=32,
                                 set_point=120, init_threshold=10.0),
            desc_bytes=16)
        with pytest.raises(ValueError, match="mismatch"):
            checkpoint.load_pytree(path, vo.init_state(rig, other))


class TestResume:
    def test_windowed_vo_resume_is_exact(self, tmp_path):
        """save at frame 5, resume in a fresh state object, frames 5-9
        must reproduce the uninterrupted run bit-for-bit (the carried
        PRNG key and thresholds ride in the state)."""
        rig, cfg = small_rig(), small_cfg()
        wcfg = window_vo.WindowVOConfig.create(cfg, window=3, ba_every=2)
        L, R = make_frames(10, rig)
        step = jax.jit(
            lambda s, l, r: window_vo.window_vo_step(s, l, r, rig, wcfg))

        s = window_vo.init_state(rig, wcfg, seed=1)
        full_poses = []
        for i in range(10):
            s, out = step(s, jnp.asarray(L[i]), jnp.asarray(R[i]))
            full_poses.append(np.asarray(out.frame.pose))
            if i == 4:
                path = str(tmp_path / "win.npz")
                checkpoint.save_pytree(path, s)

        s2 = checkpoint.load_pytree(
            path, window_vo.init_state(rig, wcfg, seed=999))
        for i in range(5, 10):
            s2, out2 = step(s2, jnp.asarray(L[i]), jnp.asarray(R[i]))
            np.testing.assert_array_equal(np.asarray(out2.frame.pose),
                                          full_poses[i])
