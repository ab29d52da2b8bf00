import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from front_end_tpu import features, services
from front_end_tpu.eval import metrics
from front_end_tpu.geometry import se3
from front_end_tpu.viz import draw
from front_end_tpu import types


class TestFeatureTables:
    def test_table_sizes_match_reference_grids(self):
        # FAST: 59 thresholds x 3 types x 2 nms = 354 (features.py:37-60)
        assert len(features.fast_combinations()) == 59 * 3 * 2
        # BRIEF: 3 bytes x 2 orientation = 6
        assert len(features.brief_combinations()) == 6
        # SURF detector: 54 x 2 x 4 = 432
        assert len(features.surf_detector_combinations()) == 54 * 2 * 4
        # BRISK: 22 x 2 x 1
        assert len(features.brisk_combinations()) == 22 * 2

    def test_stable_hex_ids(self):
        t = features.detector_table()
        ids = list(t)
        assert ids[0] == "Det0000000000"
        assert all(k.startswith("Det") and len(k) == 13 for k in ids)
        # deterministic across calls
        assert list(features.detector_table()) == ids

    def test_ids_for_family(self):
        t = features.detector_table()
        fast_ids = features.ids_for("FAST", t)
        assert len(fast_ids) == 59 * 3 * 2

    def test_make_detector_fast(self):
        t = features.detector_table()
        det_id = features.ids_for("FAST", t)[10]
        fn, ok = features.make_detector(det_id)
        assert ok
        img = jnp.asarray(np.random.RandomState(0)
                          .uniform(0, 255, (64, 96)).astype(np.float32))
        s = fn(img)
        assert s.shape == (64, 96)

    def test_make_descriptor_brief(self):
        t = features.descriptor_table()
        brief_ids = features.ids_for("BRIEF", t)
        fn, ok = features.make_descriptor(brief_ids[0])
        assert ok
        img = jnp.asarray(np.random.RandomState(1)
                          .uniform(0, 255, (96, 128)).astype(np.float32))
        d = fn(img, jnp.array([[48.0, 48.0]]))
        assert d.bits.shape[1] in (128, 256, 512)

    def test_unsupported_family_contract(self):
        fn, ok = features.make_detector(
            {"Name": "NOPE", "Param": {}, "NormType": "NORM_L2"})
        assert fn is None and not ok

    def test_export_yaml(self, tmp_path):
        p = str(tmp_path / "table.yaml")
        n = features.export_table_yaml(p)
        assert os.path.exists(p) and n > 1000


class TestServices:
    def test_single_image_detection(self):
        img = np.full((96, 128), 128.0, np.float32)
        img[30:40, 40:50] = 220.0
        # sensor-style noise: cv2-exact NMS annihilates equal-score
        # plateaus, so a noiseless constant-contrast square yields zero
        img += np.random.RandomState(0).uniform(0, 2, img.shape)
        t = features.detector_table()
        # 9_16 IDs: the 5_8 quick gate (all 8 neighbours same class,
        # cv2-exact) never fires on an axis-aligned square's corners
        ids = [i for i in features.ids_for("FAST", t)
               if t[i]["Param"]["d_type"] == "9_16"][:2]
        res = services.single_image_detection(ids, img, img)
        assert len(res) == 2
        assert res[0]["supported"]
        assert res[0]["leftFeatures"]["nPoints"] > 0
        assert res[0]["processingTime"][0]["seconds"] > 0

    def test_sweep_batching_matches_direct_detection(self):
        """Every structural-group family (FAST/ORB/BRISK/AKAZE/SURF) must
        report the same per-ID counts through the batched shared-response
        path as the direct `make_detector` call."""
        import jax.numpy as jnp
        r = np.random.RandomState(3)
        img = np.kron(r.uniform(0, 255, (12, 16)),
                      np.ones((8, 8))).astype(np.float32)
        img += r.uniform(0, 2, img.shape).astype(np.float32)
        t = features.detector_table()
        picks = []
        for fam in ("FAST", "ORB", "BRISK", "AKAZE", "SURF"):
            ids = features.ids_for(fam, t)
            picks += [ids[0], ids[len(ids) // 2]]
        res = services.single_image_detection(picks, img, img)
        for det_id, rec in zip(picks, res):
            assert rec["supported"], det_id
            fn, ok = features.make_detector(t[det_id])
            direct = int((np.asarray(fn(jnp.asarray(img))) > 0).sum())
            got = rec["leftFeatures"]["nPoints"]
            fam = t[det_id]["Name"]
            # SURF/ORB share a top-k capacity across the group; exact for
            # margin-score families
            tol = 0 if fam in ("FAST", "BRISK", "AKAZE") else \
                max(3, int(0.05 * max(direct, 1)))
            assert abs(got - direct) <= tol, (det_id, fam, got, direct)

    def test_full_fast_family_sweep_is_batched(self):
        """354 FAST IDs must run as a handful of compiled programs — one
        margin-map pair per circle type plus one vmapped stats program per
        (group, image) — NOT one launch per ID.  Asserted by counting
        program invocations (a wall-clock bound here was flaky on shared
        CPU hosts: the sweep's time is dominated by host scheduling, not
        the thing this test guards)."""
        r = np.random.RandomState(4)
        img = np.kron(r.uniform(0, 255, (12, 16)),
                      np.ones((8, 8))).astype(np.float32)
        t = features.detector_table()
        ids = features.ids_for("FAST", t)
        assert len(ids) == 354

        calls = {"response": 0, "stats": 0}
        orig_cache_get = services._RESPONSE_CACHE.__class__.__getitem__
        orig_stats = services._fast_stats_batch

        class CountingCache(dict):
            def __getitem__(self, k):
                fn = orig_cache_get(self, k)

                def counted(*a, **kw):
                    calls["response"] += 1
                    return fn(*a, **kw)
                return counted

        def counted_stats(*a, **kw):
            calls["stats"] += 1
            return orig_stats(*a, **kw)

        saved = services._RESPONSE_CACHE
        services._RESPONSE_CACHE = CountingCache(saved)
        services._fast_stats_batch = counted_stats
        try:
            res = services.single_image_detection(ids, img, img)
        finally:
            services._RESPONSE_CACHE = saved
            services._fast_stats_batch = orig_stats

        assert len(res) == 354 and all(x["supported"] for x in res)
        # 3 circle types x 2 images for the response maps; 3 x 2 vmapped
        # stats programs.  354 per-ID launches would show up here.
        assert calls["response"] == 6, calls
        assert calls["stats"] == 6, calls

    def test_keypoint_stats(self):
        s = np.zeros((10, 10))
        s[3, 4] = 1.0
        s[5, 6] = 2.0
        st = services.keypoint_stats(s)
        assert st["nPoints"] == 2
        np.testing.assert_allclose(st["X"][0], 5.0)


class TestMetrics:
    def test_ate_zero_for_identical(self):
        t = np.cumsum(np.random.RandomState(0).normal(size=(50, 3)), 0)
        assert metrics.ate_rmse(t, t) < 1e-5

    def test_ate_alignment_invariance(self):
        rs = np.random.RandomState(1)
        t = np.cumsum(rs.normal(size=(60, 3)), 0).astype(np.float32)
        H = se3.create_homog(se3.compose_R(10.0, -5.0, 20.0),
                             jnp.array([1.0, 2.0, -3.0]))
        t2 = np.array(se3.transform_points(H, jnp.asarray(t)))
        assert metrics.ate_rmse(t2, t, align=True) < 1e-3

    def test_rpe(self):
        T = np.tile(np.eye(4), (10, 1, 1))
        for i in range(10):
            T[i, 0, 3] = 0.1 * i
        r = metrics.rpe(T, T)
        assert r["trans_rmse_m"] < 1e-6

    def test_poses_from_motions(self):
        Ht = np.eye(4)
        Ht[:3, 3] = [-0.1, 0, 0]        # camera moves +x
        poses = metrics.poses_from_motions(np.tile(Ht, (5, 1, 1)))
        np.testing.assert_allclose(poses[-1][:3, 3], [0.5, 0, 0],
                                   atol=1e-6)

    def test_scaling_efficiency(self):
        eff = metrics.scaling_efficiency({1: 100.0, 4: 360.0})
        assert abs(eff[4] - 0.9) < 1e-6
        assert eff[1] == 1.0


class TestViz:
    def _kps(self, n=5):
        rs = np.random.RandomState(0)
        return types.Keypoints(
            xy=jnp.asarray(rs.uniform(5, 50, (n, 2)).astype(np.float32)),
            score=jnp.ones(n), angle=jnp.zeros(n),
            valid=jnp.ones(n, bool))

    def test_draw_keypoints(self):
        img = np.full((64, 64), 100.0)
        out = draw.draw_keypoints(img, self._kps())
        assert out.shape == (64, 64, 3) and out.dtype == np.uint8
        assert (out[..., 1] != out[..., 0]).any()   # green marks present

    def test_draw_matches(self):
        img = np.full((64, 64), 100.0)
        kl, kr = self._kps(), self._kps()
        m = types.Matches(train_idx=jnp.arange(5, dtype=jnp.int32),
                          distance=jnp.zeros(5), valid=jnp.ones(5, bool))
        out = draw.draw_matches(img, kl, img, kr, m)
        assert out.shape == (64, 128, 3)

    def test_anaglyph(self):
        l = np.full((32, 32), 200.0)
        r = np.full((32, 32), 50.0)
        out = draw.anaglyph(l, r)
        assert (out[..., 0] == 200).all() and (out[..., 2] == 50).all()


class TestControl:
    def test_control_detection(self):
        from front_end_tpu.geometry.camera import bumblebee_rig
        from front_end_tpu.ops import grid
        from front_end_tpu.pipeline import control, vo

        rig = bumblebee_rig()
        cfg = vo.VOConfig(grid=grid.GridConfig(cell_capacity=32))
        st = vo.init_state(rig, cfg)
        st2, cfg2, applied = control.control_detection(
            st, cfg, threshold=25.0, set_point=1500)
        assert applied == 1500
        assert cfg2.grid.set_point == 1500
        np.testing.assert_allclose(np.array(st2.thresholds_l), 25.0)

    def test_reset_window(self):
        from front_end_tpu.pipeline import control
        from front_end_tpu.window import tracker

        cfg = tracker.TrackerConfig(capacity=16, window=3, desc_bits=32)
        st = tracker.init_state(cfg)
        st = st._replace(frame_idx=jnp.int32(7))
        st2 = control.reset_window(st, cfg)
        assert int(st2.frame_idx) == 0
        assert not bool(st2.store.valid.any())


class TestSweepStudy:
    def test_run_condition(self):
        from front_end_tpu.analysis import sweeps
        from front_end_tpu.geometry.camera import bumblebee_rig

        res = sweeps.run_condition(jax.random.PRNGKey(0), "PCL",
                                   bumblebee_rig(), "slow", 128, 0.0, 0.0,
                                   batch=8)
        assert res["rot_err_deg"].shape == (8,)
        assert np.median(res["rot_err_deg"]) < 0.1
        assert np.median(res["trans_err_m"]) < 1e-3

    def test_window_ba_condition(self):
        """Full-window simulated BA (the bin/extractBA capability): the
        reset newest pose must be recovered on clean data and degrade
        gracefully under noise + outliers."""
        from front_end_tpu.analysis import sweeps
        from front_end_tpu.geometry.camera import bumblebee_rig

        rig = bumblebee_rig()
        ideal = sweeps.run_window_condition(
            jax.random.PRNGKey(0), rig, "medium", 100, 0.0, 0.0, batch=6)
        assert ideal["rot_err_deg"].shape == (6,)
        assert np.median(ideal["rot_err_deg"]) < 0.05
        assert np.median(ideal["trans_err_m"]) < 2e-3
        assert np.median(ideal["window_rms_px"]) < 0.2

        hard = sweeps.run_window_condition(
            jax.random.PRNGKey(0), rig, "medium", 100, 1.0, 0.15, batch=6)
        # still usable (Huber) but measurably worse than ideal
        assert np.median(hard["rot_err_deg"]) < 2.0
        assert (np.median(hard["trans_err_m"])
                >= np.median(ideal["trans_err_m"]))

    def test_sharded_condition_matches_single_device(self):
        """Monte-Carlo data parallelism: the same condition sharded over
        the 8-device mesh must produce EXACTLY the single-device results
        (same per-world keys -> same worlds; sharding is layout, not
        math)."""
        from jax.sharding import Mesh

        from front_end_tpu.analysis import sweeps
        from front_end_tpu.geometry.camera import bumblebee_rig

        rig = bumblebee_rig()
        key = jax.random.PRNGKey(3)
        single = sweeps.run_condition(key, "PCL", rig, "slow", 128,
                                      0.5, 0.1, batch=16)
        mesh = Mesh(np.array(jax.devices()[:8]), ("worlds",))
        sharded = sweeps.run_condition(key, "PCL", rig, "slow", 128,
                                       0.5, 0.1, batch=16, mesh=mesh)
        np.testing.assert_allclose(sharded["rot_err_deg"],
                                   single["rot_err_deg"], rtol=1e-5)
        np.testing.assert_allclose(sharded["trans_err_m"],
                                   single["trans_err_m"], rtol=1e-5,
                                   atol=1e-7)

    def test_study_resumable(self, tmp_path):
        from front_end_tpu.analysis import sweeps

        out = str(tmp_path)
        s1 = sweeps.run_study(out, methods=("PCL",), speeds=("slow",),
                              curves=(100,), batch=4, ideal_only=True,
                              verbose=False)
        assert s1["ran"] == 1
        s2 = sweeps.run_study(out, methods=("PCL",), speeds=("slow",),
                              curves=(100,), batch=4, ideal_only=True,
                              verbose=False)
        assert s2["ran"] == 0 and s2["skipped"] == 1
        agg = sweeps.load_study(out)
        assert "PCL" in agg and "slow" in agg["PCL"]


class TestTelemetry:
    def test_frame_clock_and_log(self):
        from front_end_tpu.pipeline import telemetry

        log = telemetry.TelemetryLog()
        with telemetry.FrameClock(log):
            _ = sum(range(1000))
        log.count("n_stereo", 42)
        d = log.to_dict()
        assert "frame" in d["stage_means_s"]
        assert d["counters"]["n_stereo"] == [42.0]

    def test_staged_timings(self):
        from front_end_tpu.geometry.camera import StereoRig
        from front_end_tpu.ops import grid
        from front_end_tpu.pipeline import telemetry, vo

        rig = StereoRig.create(fx=100.0, baseline=0.3, width=128, height=96)
        cfg = vo.VOConfig(grid=grid.GridConfig(cell_capacity=32,
                                               set_point=120),
                          desc_bytes=16, ransac_hyps=32,
                          min_track_inliers=4)
        st = vo.init_state(rig, cfg)
        img = jnp.asarray(np.random.RandomState(0)
                          .uniform(0, 255, (96, 128)).astype(np.float32))
        records, out = telemetry.staged_timings(st, img, img, rig, cfg)
        labels = [r.label for r in records]
        assert labels == ["Detection", "Description+Stereo", "KNN_Match",
                          "MotionExtraction"]
        assert all(r.seconds > 0 for r in records)


class TestFeed:
    def test_device_feed_order_and_types(self):
        from front_end_tpu.io.feed import DeviceFeed

        frames = [(np.full((8, 8), i, np.float32),
                   np.full((8, 8), i + 100, np.float32)) for i in range(5)]
        got = list(DeviceFeed(iter(frames), depth=2))
        assert len(got) == 5
        for i, (l, r) in enumerate(got):
            assert float(l[0, 0]) == i and float(r[0, 0]) == i + 100

    def test_device_feed_propagates_errors(self):
        from front_end_tpu.io.feed import DeviceFeed

        def bad():
            yield (np.zeros((4, 4)), np.zeros((4, 4)))
            raise RuntimeError("decode failed")

        it = DeviceFeed(bad(), depth=2)
        next(it)
        with pytest.raises(RuntimeError):
            next(it)


class TestFactoryZoo:
    """Every detector family of the reference factory
    (`features.py:441-452`: FAST/SURF/BRISK/AKAZE/ORB) is supported."""

    def _img(self, seed=0):
        rs = np.random.RandomState(seed)
        img = np.full((96, 128), 128.0, np.float32)
        for _ in range(40):
            y, x = rs.randint(10, 80), rs.randint(10, 110)
            s = rs.randint(4, 10)
            img[y:y + s, x:x + s] = rs.uniform(20, 235)
        # sensor-style texture so FAST corner scores don't tie (cv2-exact
        # NMS annihilates equal-score neighbours on noise-free blocks)
        img = np.clip(np.round(img + rs.normal(0, 2.0, img.shape)),
                      0, 255).astype(np.float32)
        return jnp.asarray(img)

    def test_all_detector_families_supported(self):
        t = features.detector_table()
        img = self._img()
        for fam in ("FAST", "SURF", "BRISK", "AKAZE", "ORB"):
            det_id = features.ids_for(fam, t)[0]
            fn, ok = features.make_detector(det_id)
            assert ok, fam
            s = fn(img)
            assert s.shape == img.shape, fam
            assert bool((s > 0).any()), fam

    def test_descriptor_families(self):
        t = features.descriptor_table()
        img = self._img(1)
        xy = jnp.asarray([[48.0, 40.0], [64.0, 50.0], [40.0, 60.0]])
        for fam in ("BRIEF", "SURF", "FREAK", "ORB"):
            desc_id = features.ids_for(fam, t)[0]
            fn, ok = features.make_descriptor(desc_id)
            assert ok, fam
            d = fn(img, xy)
            assert d.bits.shape[0] == 3, fam
