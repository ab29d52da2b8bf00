"""Live descriptor swap — the reference's benchmarked descriptor set
running in the VO loop.

The reference's live node hot-swaps BRIEF16/BRIEF64/SURF/SURF_EXTENDED/
FREAK/ORB descriptors (`/root/reference/bin/detect_node:24-54`; runtime
`setDetector` reconfig `src/StereoCamera.cpp:422-521`, with the matcher
NORM selected per descriptor at `:497-516`).  Here the swap is a
`VOConfig.descriptor` change (a re-jit by construction): every member of
the set must drive the SAME pipeline — detection, description, norm-
correct stereo matching, triangulation, tracking, motion — and recover
the planar ground-truth motion.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from front_end_tpu.pipeline import vo

from test_pipeline import make_planar_sequence, _rig, _cfg

SWAP_SET = ["brief", "orb", "surf", "surf_ext", "freak", "brisk"]


@pytest.mark.parametrize("descriptor", SWAP_SET)
def test_descriptor_runs_live_and_tracks(descriptor):
    shift, disp = 2, 10
    lefts, rights = make_planar_sequence(shift=shift, disp=disp)
    rig = _rig()
    cfg = _cfg().replace(descriptor=descriptor)
    Z = 200.0 * 0.5 / disp
    dx_true = shift * Z / 200.0

    state = vo.init_state(rig, cfg)
    assert state.prev.bits.shape == (cfg.grid.capacity, cfg.desc_dim)
    step = jax.jit(lambda s, l, r: vo.vo_step(s, l, r, rig, cfg))
    outs = []
    for t in range(4):
        state, out = step(state, jnp.asarray(lefts[t]),
                          jnp.asarray(rights[t]))
        outs.append(out)

    assert int(outs[0].n_stereo) > 20, descriptor
    for out in outs[1:]:
        assert bool(out.motion_ok), descriptor
        T = np.array(out.motion)[:3, 3]
        np.testing.assert_allclose(T, [-dx_true, 0.0, 0.0], atol=0.03,
                                   err_msg=descriptor)


def test_surf_descriptors_are_floats_matched_with_l2():
    cfg = _cfg().replace(descriptor="surf")
    assert cfg.desc_norm == "l2" and cfg.desc_dim == 64
    cfg = _cfg().replace(descriptor="surf_ext")
    assert cfg.desc_norm == "l2" and cfg.desc_dim == 128
    cfg = _cfg().replace(descriptor="freak")
    assert cfg.desc_norm == "hamming" and cfg.desc_dim == 512


def test_mid_stream_descriptor_swap_carries_pose():
    """The reference's setDetector service swaps descriptor family in a
    running node (`src/StereoCamera.cpp:422-521`).  Here the swap is a
    new config + state migration: the integrated pose and thresholds
    carry over, the feature memory restarts (descriptor widths differ),
    and the next frame re-seeds tracking."""
    lefts, rights = make_planar_sequence(n_frames=6)
    rig = _rig()
    cfg_a = _cfg().replace(descriptor="brief")
    cfg_b = _cfg().replace(descriptor="freak")

    state = vo.init_state(rig, cfg_a)
    step_a = jax.jit(lambda s, l, r: vo.vo_step(s, l, r, rig, cfg_a))
    for t in range(3):
        state, out = step_a(state, jnp.asarray(lefts[t]),
                            jnp.asarray(rights[t]))
    pose_before = np.array(state.pose)

    state2 = vo.swap_descriptor(state, cfg_b)
    assert state2.prev.bits.shape[1] == cfg_b.desc_dim
    np.testing.assert_array_equal(np.array(state2.pose), pose_before)

    step_b = jax.jit(lambda s, l, r: vo.vo_step(s, l, r, rig, cfg_b))
    outs = []
    for t in range(3, 6):
        state2, out = step_b(state2, jnp.asarray(lefts[t]),
                             jnp.asarray(rights[t]))
        outs.append(out)
    # frame right after the swap has no comparable features (fresh
    # memory) -> identity motion, ok flag survives via n_inliers gate;
    # subsequent frames track again
    assert bool(outs[1].motion_ok) and bool(outs[2].motion_ok)
    assert int(outs[2].n_inliers) >= 10
