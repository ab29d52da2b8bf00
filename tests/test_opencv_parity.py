"""OpenCV cross-check oracles — the reference's own verification pattern.

The reference keeps dual implementations and compares them
(`nisterExtract` vs `cvExtract`, `/root/reference/src/front_end/
algorithm.py:1473-1605` vs `:1054-1107`); SURVEY §4.2 calls for
JAX-vs-OpenCV tolerance tests.  These tests use cv2 as the independent
oracle for: FAST corner sets, cornerSubPix refinement, essential-matrix
motion recovery, and an end-to-end VO ATE bound against a small
cv2-based reference VO on the bench sequence.
"""
from __future__ import annotations

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _textured(h=160, w=220, seed=11):
    """Structured test image: blocks + gradients, uint8."""
    rs = np.random.RandomState(seed)
    img = np.full((h, w), 120.0, np.float32)
    for _ in range(220):
        y, x = rs.randint(2, h - 16), rs.randint(2, w - 16)
        s = rs.randint(3, 13)
        img[y:y + s, x:x + s] = rs.uniform(5, 250)
    return img.astype(np.uint8)


CV_TYPES = {
    "9_16": cv2.FastFeatureDetector_TYPE_9_16,
    "7_12": cv2.FastFeatureDetector_TYPE_7_12,
    "5_8": cv2.FastFeatureDetector_TYPE_5_8,
}


class TestFastParity:
    """Corner-set agreement with cv2.FastFeatureDetector — EXACT, with
    and without NMS, for all three pattern types (the dense detector
    replicates cv2's shared quick-rejection gates and its strict-greater
    tie-annihilating suppression; see ops/fast.py docstring)."""

    @pytest.mark.parametrize("fast_type", ["9_16", "7_12", "5_8"])
    @pytest.mark.parametrize("threshold", [10, 25, 40])
    def test_corner_set_no_nms(self, fast_type, threshold):
        from front_end_tpu.ops import fast as fast_mod

        img8 = _textured()
        det = cv2.FastFeatureDetector_create(
            threshold=threshold, nonmaxSuppression=False,
            type=CV_TYPES[fast_type])
        cvset = {(int(round(k.pt[0])), int(round(k.pt[1])))
                 for k in det.detect(img8)}
        s = np.asarray(fast_mod.detect_dense(
            jnp.asarray(img8, jnp.float32), float(threshold), fast_type,
            nms=False))
        ys, xs = np.nonzero(s > 0)
        mine = set(zip(xs.tolist(), ys.tolist()))
        assert mine == cvset, (
            f"{fast_type} t={threshold}: {len(mine ^ cvset)} differ "
            f"(cv2 {len(cvset)}, tpu {len(mine)})")

    @pytest.mark.parametrize("fast_type", ["9_16", "7_12", "5_8"])
    @pytest.mark.parametrize("threshold", [10, 25])
    def test_corner_set_nms(self, fast_type, threshold):
        from front_end_tpu.ops import fast as fast_mod

        img8 = _textured(seed=3)
        det = cv2.FastFeatureDetector_create(
            threshold=threshold, nonmaxSuppression=True,
            type=CV_TYPES[fast_type])
        cvset = {(int(round(k.pt[0])), int(round(k.pt[1])))
                 for k in det.detect(img8)}
        s = np.asarray(fast_mod.detect_dense(
            jnp.asarray(img8, jnp.float32), float(threshold), fast_type,
            nms=True))
        ys, xs = np.nonzero(s > 0)
        mine = set(zip(xs.tolist(), ys.tolist()))
        assert mine == cvset, (
            f"{fast_type} t={threshold}: {len(mine ^ cvset)} differ "
            f"(cv2 {len(cvset)}, tpu {len(mine)})")

    @pytest.mark.parametrize("fast_type", ["9_16", "7_12"])
    def test_margin_score_matches_cv2_score(self, fast_type):
        """The dense margin score = cv2 FAST response + 1, exactly.

        cv2 only fills `response` when nonmaxSuppression=True (with it
        off every keypoint comes back with response 0.0 — verified in
        this environment), so the oracle detects WITH suppression."""
        from front_end_tpu.ops import fast as fast_mod

        img8 = _textured(seed=7)
        det = cv2.FastFeatureDetector_create(
            threshold=15, nonmaxSuppression=True,
            type=CV_TYPES[fast_type])
        kps = det.detect(img8)
        smap = np.asarray(fast_mod.fast_score_map(
            jnp.asarray(img8, jnp.float32), fast_type))
        assert len(kps) > 20
        for k in kps:
            x, y = int(round(k.pt[0])), int(round(k.pt[1]))
            assert smap[y, x] == k.response + 1, (
                f"({x},{y}): tpu {smap[y, x]} cv2 {k.response}")


class TestCornerSubpixParity:
    def test_synthetic_corners(self):
        from front_end_tpu.ops import subpix as subpix_mod

        # checkerboard corners at known subpixel-ish locations
        h, w = 120, 160
        img = np.zeros((h, w), np.float32)
        corners = []
        for cy in range(20, h - 20, 24):
            for cx in range(20, w - 20, 28):
                img[cy:cy + 12, cx:cx + 12] = 200.0
                corners.append((cx, cy))
        img = cv2.GaussianBlur(img, (5, 5), 1.2)
        # keep float32: cv2.cornerSubPix rejects float64 point arrays
        # (checkVector(2, CV_32F) == -1 -> the "count >= 0" assertion)
        pts0 = (np.array(corners, np.float32)
                + np.array([0.8, -0.6], np.float32))

        cvpts = pts0.reshape(-1, 1, 2).copy()
        cv2.cornerSubPix(
            img.astype(np.uint8), cvpts, (5, 5), (-1, -1),
            (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 40, 1e-3))
        cvpts = cvpts.reshape(-1, 2)

        mine = np.asarray(subpix_mod.corner_subpix(
            jnp.asarray(img), jnp.asarray(pts0),
            jnp.ones((len(pts0),), bool)))
        err = np.linalg.norm(mine - cvpts, axis=1)
        assert np.median(err) < 0.35, f"median {np.median(err):.3f}"
        assert np.mean(err < 0.75) > 0.85


class TestEssentialParity:
    def _two_view(self, seed=0, n=120, noise=0.3):
        rs = np.random.RandomState(seed)
        fx, cx, cy, b = 400.0, 200.0, 150.0, 0.5
        K = np.array([[fx, 0, cx], [0, fx, cy], [0, 0, 1.0]])
        X = np.stack([rs.uniform(-4, 4, n), rs.uniform(-2, 2, n),
                      rs.uniform(6, 18, n)], -1)
        ang = np.deg2rad([1.2, -2.0, 0.6])
        Rm = cv2.Rodrigues(ang)[0]
        t = np.array([0.25, -0.05, 0.9])
        Xb = X @ Rm.T + t
        ua = X @ K.T
        ua = ua[:, :2] / ua[:, 2:3] + rs.normal(0, noise, (n, 2))
        ub = Xb @ K.T
        ub = ub[:, :2] / ub[:, 2:3] + rs.normal(0, noise, (n, 2))
        return K, Rm, t, ua, ub, X, Xb, fx, (cx, cy), b

    def test_motion_vs_cv2_recover_pose(self):
        """essential_scaled_motion vs cv2.findEssentialMat+recoverPose on
        the same synthetic tracks (reference oracle:
        `algorithm.py:1054-1107` cvExtract)."""
        from front_end_tpu.geometry.camera import StereoRig
        from front_end_tpu.motion import essential as ess

        K, Rm, t, ua, ub, X, Xb, fx, pp, b = self._two_view()
        E, _ = cv2.findEssentialMat(ub, ua, K, cv2.RANSAC, 0.999, 1.0)
        _, R_cv, t_cv, _ = cv2.recoverPose(E, ub, ua, K)

        rig = StereoRig.create(fx=fx, cx=pp[0], cy=pp[1], baseline=b,
                               width=400, height=300)
        n = len(ua)
        uva = np.concatenate([ua, ua - np.array([fx * b, 0]) /
                              X[:, 2:3]], -1)
        uvb = np.concatenate([ub, ub - np.array([fx * b, 0]) /
                              Xb[:, 2:3]], -1)
        res = ess.essential_scaled_motion(
            jax.random.PRNGKey(1), jnp.asarray(uva, jnp.float32),
            jnp.asarray(uvb, jnp.float32), jnp.asarray(X, jnp.float32),
            jnp.asarray(Xb, jnp.float32), jnp.ones((n,), bool), rig,
            n_hyps=256, threshold_px=1.0)
        H = np.asarray(res.H)
        R_est, t_est = H[:3, :3], H[:3, 3]

        # both against ground truth: rotation within 0.5 deg of each other
        def rot_err(Ra, Rb):
            c = (np.trace(Ra.T @ Rb) - 1) / 2
            return np.degrees(np.arccos(np.clip(c, -1, 1)))

        err_tpu = rot_err(R_est, Rm)
        err_cv = rot_err(R_cv, Rm)
        assert err_tpu < max(2.0 * err_cv, 0.5), (err_tpu, err_cv)

        # translation direction against ground truth
        def dir_err(ta, tb):
            c = np.dot(ta, tb) / (np.linalg.norm(ta) * np.linalg.norm(tb))
            return np.degrees(np.arccos(np.clip(abs(c), -1, 1)))

        assert dir_err(t_est, t) < max(
            2.0 * dir_err(t_cv.ravel(), t), 2.0)
        # scale recovered from stereo must be near truth
        assert abs(np.linalg.norm(t_est) - np.linalg.norm(t)) < 0.15


@pytest.mark.slow
class TestVOAgainstCv2Reference:
    """End-to-end ATE bound: the TPU pipeline must track the bench
    sequence at least as well as a small cv2-based reference VO
    (BASELINE.md north star: 'ATE within OpenCV-reference bound')."""

    def _cv2_vo(self, lefts, rights, rig):
        from cv2_ref import cv2_stereo_vo
        return cv2_stereo_vo(lefts, rights, rig)

    def test_ate_bound(self):
        import bench as bench_mod
        from front_end_tpu.eval import metrics
        from front_end_tpu.geometry.camera import StereoRig
        from front_end_tpu.ops import grid
        from front_end_tpu.pipeline import vo

        h, w, disp, shift, nf = 200, 320, 12, 3, 12
        lefts, rights = bench_mod.make_sequence(nf, h=h, w=w, disp=disp,
                                                shift=shift)
        rig = StereoRig.create(fx=300.0, cx=(w - 1) / 2, cy=(h - 1) / 2,
                               baseline=0.5, width=w, height=h)
        # ground truth: fronto-parallel plane at Z = fx*b/disp moving by
        # shift px/frame  =>  t_x = shift * b / disp per frame
        tx = shift * rig.baseline / disp
        gt = np.stack([np.eye(4) for _ in range(nf)])
        for i in range(nf):
            gt[i, 0, 3] = -tx * i  # camera moves +x in world = scene -x

        cfg = vo.VOConfig(
            grid=grid.GridConfig(cell_capacity=256, set_point=1200,
                                 init_threshold=15.0),
            desc_bytes=32, ransac_hyps=256, ransac_threshold=0.3,
            max_disparity=40.0, min_track_inliers=10)
        state = vo.init_state(rig, cfg)
        step = jax.jit(lambda s, l, r: vo.vo_step(s, l, r, rig, cfg))
        poses = []
        for i in range(nf):
            state, out = step(state, jnp.asarray(lefts[i]),
                              jnp.asarray(rights[i]))
            poses.append(np.asarray(out.pose))
        poses = np.stack(poses)

        cv_poses = self._cv2_vo(lefts, rights, rig)

        ate_tpu = metrics.ate_rmse(poses[:, :3, 3], gt[:, :3, 3])
        ate_cv = metrics.ate_rmse(cv_poses[:, :3, 3], gt[:, :3, 3])
        # north-star bound: within 1.5x of the cv2 reference (or
        # absolutely tight if cv2 nails it)
        assert ate_tpu <= max(1.5 * ate_cv, 0.02), (ate_tpu, ate_cv)
