"""Parity tests for the production Pallas FAST kernels.

`ops/fast.py` routes TPU detection through
`ops/pallas/fast_kernel.py` (margins + the fused
margins/threshold/NMS detect kernel); these tests pin that exact code:
interpret-mode runs on the CPU mesh assert BIT-identity with the XLA
stencil path for every circle type, NMS mode and per-pixel threshold
map; a `tpu`-marked test runs the compiled kernels on real hardware
(the driver's bench environment).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from front_end_tpu.ops import fast as fast_mod
from front_end_tpu.ops.pallas import fast_kernel


def _image(h=180, w=300, seed=0):
    rs = np.random.RandomState(seed)
    img = np.kron(rs.uniform(0, 255, (h // 6, w // 6)),
                  np.ones((6, 6))).astype(np.float32)
    img += rs.uniform(0, 2, img.shape).astype(np.float32)
    return img[:h, :w]


@pytest.mark.parametrize("fast_type", ["9_16", "7_12", "5_8"])
def test_interpret_margins_bit_identical(fast_type):
    img = jnp.asarray(_image())
    d0, s0 = fast_mod.fast_margins(img, fast_type, backend="xla")
    d1, s1 = fast_kernel.fast_margins_pallas(img, fast_type,
                                             interpret=True)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


@pytest.mark.parametrize("fast_type", ["9_16", "7_12", "5_8"])
@pytest.mark.parametrize("nms", [True, False])
def test_interpret_fused_detect_bit_identical(fast_type, nms):
    img = jnp.asarray(_image(seed=1))
    h, w = img.shape
    # per-cell threshold map like the adaptive grid controller's
    rs = np.random.RandomState(2)
    tm = jnp.asarray(np.kron(rs.uniform(5, 40, (3, 4)).astype(np.float32),
                             np.ones((60, 75), np.float32))[:h, :w])
    d0, s0 = fast_mod.fast_margins(img, fast_type, backend="xla")
    ref = jnp.where(d0 > tm, s0, 0.0)
    if nms:
        ref = fast_mod.nms_cv2(ref)
    got = fast_kernel.fast_detect_pallas(img, tm, fast_type, nms,
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_interpret_batched_matches_singles():
    imgs = jnp.asarray(np.stack([_image(seed=3), _image(seed=4)]))
    got = fast_kernel.fast_detect_pallas(imgs, 15.0, "9_16", True,
                                         interpret=True)
    for b in range(2):
        one = fast_kernel.fast_detect_pallas(imgs[b], 15.0, "9_16", True,
                                             interpret=True)
        np.testing.assert_array_equal(np.asarray(got[b]), np.asarray(one))


def test_vmap_falls_back_to_xla():
    """Under vmap the Pallas path cannot batch; the dispatcher must fall
    back to the XLA stencil and still match."""
    imgs = jnp.asarray(np.stack([_image(seed=5), _image(seed=6)]))
    vm = jax.vmap(lambda im: fast_mod.detect_dense(im, 12.0, "9_16"))
    got = vm(imgs)
    ref = fast_mod.detect_dense(imgs, 12.0, "9_16", backend="xla")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.tpu
def test_compiled_kernels_match_on_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("needs real TPU")
    img = jnp.asarray(_image(seed=7))
    for ft in ("9_16", "7_12", "5_8"):
        d0, s0 = fast_mod.fast_margins(img, ft, backend="xla")
        d1, s1 = fast_kernel.fast_margins_pallas(img, ft)
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
        ref = fast_mod.nms_cv2(jnp.where(d0 > 15.0, s0, 0.0))
        got = fast_kernel.fast_detect_pallas(img, 15.0, ft, True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


# ---- fused grid kernel (detect + pool + counts in one pass) --------------

def _grid_cfg(**kw):
    from front_end_tpu.ops import grid as grid_mod
    return grid_mod.GridConfig(**kw)


def _xla_select(img, cfg):
    from front_end_tpu.ops import grid as grid_mod
    t = cfg.init_thresholds()
    tmap = grid_mod.threshold_image(t, *img.shape, cfg)
    smap = fast_mod.detect_dense(img, tmap, cfg.fast_type, nms=True,
                                 backend="xla")
    return smap, grid_mod._detect_from_map(smap, t, cfg)


def _fused_select(img, cfg):
    from front_end_tpu.ops import grid as grid_mod
    H, W = img.shape
    t = cfg.init_thresholds()
    tmap = grid_mod.threshold_image(t, H, W, cfg)
    ch, cw = grid_mod._cell_dims(H, W, cfg)
    pooled, code, counts = fast_kernel.fast_detect_grid_pallas(
        img, tmap, cfg.fast_type, nms=True,
        cell=(cfg.grid_rows, cfg.grid_cols, ch, cw), interpret=True)
    return grid_mod._select_from_pooled(pooled, code, counts, t, cfg,
                                        H, W)


def _kp_set(det):
    xy = np.asarray(det.keypoints.xy)
    sc = np.asarray(det.keypoints.score)
    v = np.asarray(det.keypoints.valid)
    return {(float(x), float(y), float(s))
            for (x, y), s in zip(xy[v], sc[v])}


def test_fused_grid_kernel_exact_parity_even_cells():
    """Even cell dims: the fused kernel's selected keypoint set, counts
    and controller update must EQUAL the XLA path's."""
    img = jnp.asarray(_image(h=192, w=256, seed=3))
    cfg = _grid_cfg(grid_rows=2, grid_cols=2, cell_capacity=96,
                    set_point=400, init_threshold=10.0)
    _, det_x = _xla_select(img, cfg)
    det_f = _fused_select(img, cfg)
    np.testing.assert_array_equal(np.asarray(det_x.cell_counts),
                                  np.asarray(det_f.cell_counts))
    np.testing.assert_array_equal(np.asarray(det_x.thresholds),
                                  np.asarray(det_f.thresholds))
    assert _kp_set(det_x) == _kp_set(det_f)


def test_fused_grid_kernel_odd_cells_correctness():
    """Odd cell width (w=300, Gc=3 -> cw=100? use w=301): counts stay
    exact; every selected keypoint's position/score must exist in the
    dense response map; capacity respected; boundary attribution may
    shift cells but never invents or corrupts corners."""
    img = jnp.asarray(_image(h=186, w=279, seed=5))   # ch=93, cw=93 odd
    cfg = _grid_cfg(grid_rows=2, grid_cols=3, cell_capacity=96,
                    set_point=400, init_threshold=10.0)
    smap, det_x = _xla_select(img, cfg)
    det_f = _fused_select(img, cfg)
    np.testing.assert_array_equal(np.asarray(det_x.cell_counts),
                                  np.asarray(det_f.cell_counts))
    sm = np.asarray(smap)
    kps = _kp_set(det_f)
    assert len(kps) > 50
    for x, y, s in kps:
        assert sm[int(y), int(x)] == s, (x, y, s, sm[int(y), int(x)])
    # no duplicate positions
    assert len({(x, y) for x, y, _ in kps}) == len(kps)


def test_fused_grid_detect_pair_wiring():
    """grid.detect_pair's fused branch (forced) must agree with the XLA
    branch on an even-cell pair."""
    from front_end_tpu.ops import grid as grid_mod
    left = jnp.asarray(_image(h=192, w=256, seed=7))
    right = jnp.asarray(_image(h=192, w=256, seed=8))
    cfg = _grid_cfg(grid_rows=2, grid_cols=2, cell_capacity=96,
                    set_point=400, init_threshold=10.0)
    tl = cfg.init_thresholds()
    dl_x, dr_x = grid_mod.detect_pair(left, right, tl, tl, cfg)

    # force the fused path via the kernel (interpret) + selector
    dl_f = _fused_select(left, cfg)
    dr_f = _fused_select(right, cfg)
    assert _kp_set(dl_x) == _kp_set(dl_f)
    assert _kp_set(dr_x) == _kp_set(dr_f)


@pytest.mark.parametrize("seed", [11, 12, 13, 14, 15, 16])
def test_fused_grid_kernel_parity_fuzz(seed):
    """Seed fuzz of the fused-vs-XLA selection parity (varying texture,
    image size, grid geometry, set-point, threshold).  Exact set parity
    is demanded on EVEN cell dims; counts must be exact always.  Seed 15
    of the first version of this fuzz caught a real bug: overlapping
    per-cell pooled slices at odd cell dims duplicated the straddling
    row and silently dropped the weakest corners."""
    rs = np.random.RandomState(seed)
    img = jnp.asarray(_image(h=128 + 32 * (seed % 3), w=256, seed=seed))
    h, w = img.shape
    # pick the largest grid whose cells come out even
    gr = next(g for g in (2, 1) if (h // g) % 2 == 0)
    gc = next(g for g in (3, 2, 1) if (w // g) % 2 == 0)
    cfg = _grid_cfg(grid_rows=gr, grid_cols=gc, cell_capacity=64,
                    set_point=int(rs.randint(100, 600)),
                    init_threshold=float(rs.randint(6, 20)))
    _, det_x = _xla_select(img, cfg)
    det_f = _fused_select(img, cfg)
    np.testing.assert_array_equal(np.asarray(det_x.cell_counts),
                                  np.asarray(det_f.cell_counts))
    assert _kp_set(det_x) == _kp_set(det_f)


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_fused_grid_kernel_odd_cells_fuzz(seed):
    """Odd cell dims: boundary blocks may shift a corner's CELL
    attribution (capacity bookkeeping) but never its position/score,
    never duplicate it, and counts stay exact."""
    img = jnp.asarray(_image(h=126, w=252, seed=seed))   # 63x84... cells
    cfg = _grid_cfg(grid_rows=2, grid_cols=3, cell_capacity=64,
                    set_point=300, init_threshold=10.0)
    from front_end_tpu.ops import grid as grid_mod
    t = cfg.init_thresholds()
    tmap = grid_mod.threshold_image(t, *img.shape, cfg)
    smap = np.asarray(fast_mod.detect_dense(img, tmap, cfg.fast_type,
                                            nms=True, backend="xla"))
    _, det_x = _xla_select(img, cfg)
    det_f = _fused_select(img, cfg)
    np.testing.assert_array_equal(np.asarray(det_x.cell_counts),
                                  np.asarray(det_f.cell_counts))
    kps = _kp_set(det_f)
    assert len(kps) > 30
    for x, y, s in kps:
        assert smap[int(y), int(x)] == s
    assert len({(x, y) for x, y, _ in kps}) == len(kps)


@pytest.mark.tpu
def test_fused_grid_kernel_compiled_on_tpu():
    """On-chip: the COMPILED fused kernel (one-hot compaction matmuls,
    roll deinterleave) must reproduce the XLA selection exactly on even
    cell dims."""
    if jax.default_backend() != "tpu":
        pytest.skip("needs real TPU")
    from front_end_tpu.ops import grid as grid_mod
    img = jnp.asarray(_image(h=192, w=256, seed=3))
    cfg = _grid_cfg(grid_rows=2, grid_cols=2, cell_capacity=96,
                    set_point=400, init_threshold=10.0)
    t = cfg.init_thresholds()
    tmap = grid_mod.threshold_image(t, *img.shape, cfg)
    ch, cw = grid_mod._cell_dims(*img.shape, cfg)
    pooled, code, counts = fast_kernel.fast_detect_grid_pallas(
        img, tmap, cfg.fast_type, nms=True,
        cell=(cfg.grid_rows, cfg.grid_cols, ch, cw))
    det_f = grid_mod._select_from_pooled(pooled, code, counts, t, cfg,
                                         *img.shape)
    _, det_x = _xla_select(img, cfg)
    np.testing.assert_array_equal(np.asarray(det_x.cell_counts),
                                  np.asarray(det_f.cell_counts))
    assert _kp_set(det_x) == _kp_set(det_f)


@pytest.mark.parametrize("fast_type", ["9_16", "7_12", "5_8"])
def test_fused_grid_kernel_all_circle_types(fast_type):
    """The fused kernel's parity must hold for every FAST circle type
    the grid can be configured with (the reference's live pipeline uses
    TYPE_7_12, live_stereo.cpp:293)."""
    img = jnp.asarray(_image(h=192, w=252, seed=9))
    cfg = _grid_cfg(grid_rows=2, grid_cols=3, cell_capacity=64,
                    set_point=300, init_threshold=10.0,
                    fast_type=fast_type)
    _, det_x = _xla_select(img, cfg)
    det_f = _fused_select(img, cfg)
    np.testing.assert_array_equal(np.asarray(det_x.cell_counts),
                                  np.asarray(det_f.cell_counts))
    assert _kp_set(det_x) == _kp_set(det_f)


def test_fused_gate_falls_back_on_oversized_grids(monkeypatch):
    """Grids beyond the kernel's static count register (Gr > 8 or
    Gc > 128) must route to the XLA path, not crash the trace — the
    fused kernel packs per-cell counts into one (8, 128) VREG."""
    from front_end_tpu.ops import grid as grid_mod
    big_r = _grid_cfg(grid_rows=9, grid_cols=3, cell_capacity=16,
                      set_point=100, init_threshold=10.0)
    # the full detect() works on such a grid (XLA path, real backend)
    img = jnp.asarray(_image(h=96, w=128, seed=4))
    det = grid_mod.detect(img, big_r.init_thresholds(), big_r)
    assert det.cell_counts.shape == (9, 3)

    # with the backend forced to "tpu", the gate itself must exclude
    # oversized grids so they keep routing to that XLA path
    monkeypatch.setattr(grid_mod.jax, "default_backend", lambda: "tpu")
    x = jnp.zeros((64, 128), jnp.float32)
    ok = _grid_cfg(grid_rows=2, grid_cols=3, cell_capacity=16,
                   set_point=100, init_threshold=10.0)
    assert grid_mod._use_fused_grid_kernel(ok, x)
    assert not grid_mod._use_fused_grid_kernel(big_r, x)
    big_c = _grid_cfg(grid_rows=2, grid_cols=129, cell_capacity=16,
                      set_point=100, init_threshold=10.0)
    assert not grid_mod._use_fused_grid_kernel(big_c, x)
