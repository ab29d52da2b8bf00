import jax
import jax.numpy as jnp
import numpy as np

from front_end_tpu.geometry.camera import StereoRig
from front_end_tpu.ops import grid
from front_end_tpu.pipeline import vo


def make_planar_sequence(n_frames=6, shift=2, disp=10, h=192, w=256, seed=21):
    """Fronto-parallel planar scene: camera translates +X.

    Left frame t = crop of a big texture at x-offset t*shift; right frame
    sees the same content `disp` px to the left (ur = ul − disp).  With
    fx, B chosen so Z = fx·B/disp, ground-truth per-frame motion is
    dx = shift·Z/fx metres along +X.
    """
    rs = np.random.RandomState(seed)
    big = np.full((h, w + disp + shift * n_frames + 8, ), 0.0)
    W_big = w + disp + shift * n_frames + 8
    big = np.full((h, W_big), 128.0, np.float32)
    for _ in range(220):
        y, x = rs.randint(5, h - 15), rs.randint(5, W_big - 15)
        s = rs.randint(4, 12)
        big[y:y + s, x:x + s] = rs.uniform(15, 240)
    # per-pixel sensor-style texture: uniform-value squares tie every
    # corner score and cv2-exact NMS (ties annihilate) would kill them;
    # real frames never tie.  Rounded so values stay integer-like.
    big = np.clip(np.round(big + rs.normal(0, 2.0, big.shape)),
                  0, 255).astype(np.float32)

    lefts, rights = [], []
    for t in range(n_frames):
        off = t * shift
        lefts.append(big[:, off:off + w])
        rights.append(big[:, off + disp:off + disp + w])
    return np.stack(lefts), np.stack(rights)


def _cfg():
    return vo.VOConfig(
        grid=grid.GridConfig(grid_rows=2, grid_cols=3, cell_capacity=96,
                             set_point=600, init_threshold=15.0),
        desc_bytes=16, ransac_hyps=128, ransac_threshold=0.15,
        max_disparity=40.0, min_track_inliers=10)


def _rig(h=192, w=256):
    # fx=200, B=0.5 -> disp 10 px at Z=10 m
    return StereoRig.create(fx=200.0, cx=(w - 1) / 2, cy=(h - 1) / 2,
                            baseline=0.5, width=w, height=h)


class TestVOPipeline:
    def test_tracks_planar_translation(self):
        shift, disp = 2, 10
        lefts, rights = make_planar_sequence(shift=shift, disp=disp)
        rig = _rig()
        cfg = _cfg()
        Z = 200.0 * 0.5 / disp                     # 10 m
        dx_true = shift * Z / 200.0                # 0.1 m per frame

        state = vo.init_state(rig, cfg)
        step = jax.jit(lambda s, l, r: vo.vo_step(s, l, r, rig, cfg))
        outs = []
        for t in range(lefts.shape[0]):
            state, out = step(state, jnp.asarray(lefts[t]),
                              jnp.asarray(rights[t]))
            outs.append(out)

        assert int(outs[0].n_stereo) > 30
        for out in outs[1:]:
            assert bool(out.motion_ok)
            assert int(out.n_inliers) >= 10
            T = np.array(out.motion)[:3, 3]
            # camera moves +X  =>  points move −X in camera frame
            np.testing.assert_allclose(T, [-dx_true, 0.0, 0.0], atol=0.02)
            R = np.array(out.motion)[:3, :3]
            np.testing.assert_allclose(R, np.eye(3), atol=5e-3)

        # integrated pose: camera at +X * (n-1) * dx
        p = np.array(state.pose)[:3, 3]
        n = lefts.shape[0] - 1
        np.testing.assert_allclose(p, [dx_true * n, 0, 0],
                                   atol=0.02 * n + 0.02)

    def test_run_sequence_scan(self):
        lefts, rights = make_planar_sequence(n_frames=4)
        rig = _rig()
        cfg = _cfg()
        state = vo.init_state(rig, cfg)
        f = jax.jit(lambda s, ls, rs_: vo.run_sequence(s, ls, rs_, rig, cfg))
        final, outs = f(state, jnp.asarray(lefts), jnp.asarray(rights))
        assert outs.pose.shape == (4, 4, 4)
        assert bool(np.array(outs.motion_ok)[1:].all())

    def test_first_frame_identity(self):
        lefts, rights = make_planar_sequence(n_frames=1)
        rig, cfg = _rig(), _cfg()
        state = vo.init_state(rig, cfg)
        state, out = vo.vo_step(state, jnp.asarray(lefts[0]),
                                jnp.asarray(rights[0]), rig, cfg)
        np.testing.assert_allclose(np.array(out.motion), np.eye(4))
        np.testing.assert_allclose(np.array(out.pose), np.eye(4))

    def test_essential_motion_mode(self):
        lefts, rights = make_planar_sequence(n_frames=3)
        rig = _rig()
        cfg = _cfg().replace(motion="essential", lm_refine=True)
        state = vo.init_state(rig, cfg)
        step = jax.jit(lambda s, l, r: vo.vo_step(s, l, r, rig, cfg))
        for t in range(3):
            state, out = step(state, jnp.asarray(lefts[t]),
                              jnp.asarray(rights[t]))
        T = np.array(out.motion)[:3, 3]
        np.testing.assert_allclose(T, [-0.1, 0.0, 0.0], atol=0.05)
