import jax
import jax.numpy as jnp
import numpy as np

from front_end_tpu.geometry import se3
from front_end_tpu.geometry.camera import bumblebee_rig
from front_end_tpu.sim import synthetic as sim
from front_end_tpu.types import Descriptors, Keypoints
from front_end_tpu.window import tracker


def make_frames(n_frames=4, L=128, seed=0):
    """Geometric synthetic: static world landmarks with unique random
    descriptors, a forward-moving camera, per-frame feature sets."""
    rig = bumblebee_rig()
    key = jax.random.PRNGKey(seed)
    cat = sim.motion_category("slow")
    key, k = jax.random.split(key)
    world = sim.sample_world(k, rig, cat, L)
    Xw = world.Xa                                     # world == cam0 frame

    key, k = jax.random.split(key)
    bits = (jax.random.uniform(k, (L, 256)) > 0.5).astype(jnp.float32)

    poses = [jnp.eye(4)]
    for _ in range(n_frames - 1):
        key, k = jax.random.split(key)
        _, Ht = sim.sample_motion(k, cat)
        poses.append(Ht @ poses[-1])

    frames = []
    for T in poses:
        Xc = se3.transform_points(T, Xw)
        uvl, uvr = rig.project(Xc)
        uv4 = jnp.concatenate([uvl, uvr], -1)
        vis = rig.in_view(Xc) & world.valid
        kps = Keypoints(xy=uvl, score=jnp.ones(L), angle=jnp.zeros(L),
                        valid=vis)
        frames.append(dict(kps=kps, desc=Descriptors(bits=bits),
                           X_cam=Xc, stereo_valid=vis, uv4=uv4,
                           pose_cur=T))
    return rig, frames, poses, Xw


def _cfg(L=128):
    return tracker.TrackerConfig(capacity=256, window=3, desc_bits=256,
                                 roi_box=150.0)


class TestTracker:
    def test_first_frame_allocates(self):
        rig, frames, poses, Xw = make_frames()
        cfg = _cfg()
        st = tracker.init_state(cfg)
        upd = tracker.update(st, **frames[0], cfg=cfg, rig=rig)
        nvis = int(frames[0]["kps"].valid.sum())
        assert int(upd.n_new) == nvis
        assert int(upd.n_tracked) == 0
        assert int(upd.state.store.valid.sum()) == nvis

    def test_second_frame_tracks(self):
        rig, frames, poses, Xw = make_frames()
        cfg = _cfg()
        st = tracker.init_state(cfg)
        upd = tracker.update(st, **frames[0], cfg=cfg, rig=rig)
        upd2 = tracker.update(upd.state, **frames[1], cfg=cfg, rig=rig)
        covis = int((frames[0]["kps"].valid & frames[1]["kps"].valid).sum())
        assert int(upd2.n_tracked) >= 0.9 * covis
        assert int(upd2.n_new) <= covis * 0.2 + 8
        # tracked landmarks have 2 in-window observations
        tl = np.array(upd2.state.store.track_len)
        assert (tl == 2).sum() >= 0.9 * covis

    def test_window_shift_register(self):
        rig, frames, poses, Xw = make_frames(n_frames=5)
        cfg = _cfg()
        st = tracker.init_state(cfg)
        for f in frames[:4]:
            st = tracker.update(st, **f, cfg=cfg, rig=rig).state
        vis = np.array(st.store.vis)
        # a landmark tracked through all 4 frames has all 3 window slots set
        full = vis.all(axis=1)
        assert full.sum() > 50
        assert bool(np.array(st.pose_valid).all())
        # poses in the window are the LAST 3 frame poses
        np.testing.assert_allclose(np.array(st.poses[-1]),
                                   np.array(frames[3]["pose_cur"]), atol=1e-5)
        np.testing.assert_allclose(np.array(st.poses[0]),
                                   np.array(frames[1]["pose_cur"]), atol=1e-5)

    def test_world_positions_consistent(self):
        rig, frames, poses, Xw = make_frames()
        cfg = _cfg()
        st = tracker.init_state(cfg)
        upd = tracker.update(st, **frames[0], cfg=cfg, rig=rig)
        store = upd.state.store
        v = np.array(store.valid)
        # store world positions should match the true landmarks (frame0 =
        # identity pose, X_cam == Xw); match rows by nearest neighbour
        Xs = np.array(store.Xw)[v]
        Xt = np.array(Xw)[np.array(frames[0]["kps"].valid)]
        d = np.linalg.norm(Xs[:, None] - Xt[None], axis=-1).min(1)
        assert d.max() < 1e-3

    def test_window_ba_refines(self):
        rig, frames, poses, Xw = make_frames(n_frames=3, L=256)
        cfg = tracker.TrackerConfig(capacity=512, window=3, desc_bits=256,
                                    roi_box=150.0)
        st = tracker.init_state(cfg)
        for f in frames:
            st = tracker.update(st, **f, cfg=cfg, rig=rig).state
        # perturb window poses 1..2 and landmark estimates
        key = jax.random.PRNGKey(9)
        dxi = 0.01 * jax.random.normal(key, (3, 6)).at[0].set(0.0)
        poses_pert = jax.vmap(lambda d, t: se3.se3_exp(d) @ t)(dxi, st.poses)
        st_bad = st._replace(poses=poses_pert)
        # gate off: the deliberate pose perturbation pushes residuals past
        # the live outlier gate (which assumes a VO-consistent init)
        st_ref, res = tracker.run_window_ba(st_bad, rig, iters=10,
                                            outlier_gate_px=None)
        assert float(res.cost) < float(res.cost0)
        ang = np.degrees(np.array(jax.vmap(se3.rotation_geodesic_error)(
            st_ref.poses[:, :3, :3], st.poses[:, :3, :3])))
        assert ang.max() < 0.2

    def test_jit_scan(self):
        rig, frames, poses, Xw = make_frames(n_frames=4)
        cfg = _cfg()
        st = tracker.init_state(cfg)

        @jax.jit
        def step(s, f):
            u = tracker.update(s, f["kps"], f["desc"], f["X_cam"],
                               f["stereo_valid"], f["uv4"], f["pose_cur"],
                               cfg, rig)
            return u.state, (u.n_tracked, u.n_new)

        for f in frames:
            st, _ = step(st, f)
        assert int(st.frame_idx) == 4


class TestTopkOnehot:
    """`dense_select.topk_onehot`: the sort-free exact top-k compaction
    the windowed BA uses (`tracker.run_window_ba`)."""

    def test_matches_sorted_reference(self):
        import jax
        from front_end_tpu.ops.dense_select import (compact_rows,
                                                    topk_onehot)

        rs = np.random.RandomState(7)
        fn = jax.jit(topk_onehot, static_argnums=(1, 2))
        for trial in range(25):
            M = int(rs.randint(8, 300))
            k = int(rs.randint(1, M + 1))
            smax = int(rs.choice([5, 100, 39999]))
            nvalid = int(rs.randint(0, M + 1))
            score = np.zeros(M, np.float32)
            idx = rs.choice(M, nvalid, replace=False)
            score[idx] = rs.randint(1, smax + 1, nvalid)
            oh, mask, n_sel = fn(score, k, smax)
            oh, mask = np.asarray(oh), np.asarray(mask)
            n_sel = int(n_sel)
            # reference: top-k by (score desc, index asc), valid only —
            # lax.top_k's own tie rule
            order = sorted(range(M), key=lambda i: (-score[i], i))
            exp = sorted(i for i in order[:k] if score[i] > 0)
            got = sorted(np.nonzero(mask)[0].tolist())
            assert got == exp, (trial, got, exp)
            assert n_sel == len(exp)
            # oh compacts in index order, zero-padded past n_sel
            X = rs.rand(M, 3).astype(np.float32)
            ck = np.asarray(compact_rows(jnp.asarray(oh), X))
            assert np.array_equal(ck[:n_sel], X[exp])
            assert np.all(ck[n_sel:] == 0)
