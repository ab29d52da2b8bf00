"""Rectified stereo camera model — the typed config that replaces the
reference's `bumblebee` calibration server.

The reference fetched Pl/Pr/Q/ROIs over ROS services at node startup
(`src/StereoCamera.cpp:10-21`, `src/WindowMatcher.cpp:11-24`,
`src/front_end/~simulation.py:84-105` shows the exact contract:
{Pl, Pr, Q, width, height, f, pp, k}).  Here the rig is a jit-transparent
pytree dataclass; every geometric op is batched jnp.

Conventions: rectified pair, identical intrinsics, baseline B along +x of
the left camera.  Pl = K[I|0], Pr = K[I| -B ex].  Disparity d = ul - ur > 0
for points in front of the rig.  Q-triangulation follows
`src/WindowMatcher.cpp:36-51` / `~simulation.py:384-391` (OpenCV Q).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class StereoRig:
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    baseline: jnp.ndarray          # metres
    width: int = struct.field(pytree_node=False, default=1024)
    height: int = struct.field(pytree_node=False, default=768)

    @classmethod
    def create(cls, fx, fy=None, cx=None, cy=None, baseline=0.12,
               width=1024, height=768):
        fy = fx if fy is None else fy
        cx = (width - 1) / 2.0 if cx is None else cx
        cy = (height - 1) / 2.0 if cy is None else cy
        # Host (numpy) scalars, NOT jnp: a rig is closed over by nearly
        # every jitted pipeline function, and a device-committed array
        # captured as a jit constant permanently degrades host->device
        # transfer bandwidth ~100x on the remote-TPU (axon) backend —
        # numpy constants fold into the executable instead.  Traced
        # (batched) rigs built inside jit pass through the tracer branch.
        import jax

        def _h(v):
            if isinstance(v, jax.core.Tracer):
                return v
            return np.asarray(v, np.float32)
        return cls(fx=_h(fx), fy=_h(fy), cx=_h(cx), cy=_h(cy),
                   baseline=_h(baseline),
                   width=int(width), height=int(height))

    # -- matrices ----------------------------------------------------------
    @property
    def K(self):
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack([
            jnp.stack([self.fx, z, self.cx], -1),
            jnp.stack([z, self.fy, self.cy], -1),
            jnp.stack([z, z, o], -1)], -2)

    @property
    def Pl(self):
        return jnp.concatenate([self.K, jnp.zeros_like(self.K[..., :1])], -1)

    @property
    def Pr(self):
        t = jnp.stack([-self.fx * self.baseline,
                       jnp.zeros_like(self.fx), jnp.zeros_like(self.fx)], -1)
        return jnp.concatenate([self.K, t[..., None]], -1)

    @property
    def Q(self):
        """OpenCV reprojection matrix: Q·[u,v,d,1]ᵀ ∝ [X,Y,Z,1]ᵀ."""
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack([
            jnp.stack([o, z, z, -self.cx], -1),
            jnp.stack([z, o, z, -self.cy], -1),
            jnp.stack([z, z, z, self.fx], -1),
            jnp.stack([z, z, o / self.baseline, z], -1)], -2)

    @property
    def f(self):
        return self.fx

    @property
    def pp(self):
        return jnp.stack([self.cx, self.cy], -1)

    # -- geometry ----------------------------------------------------------
    def triangulate(self, xy_left, xy_right):
        """Q-matrix stereo triangulation (`WindowMatcher.cpp:36-51`).

        xy_left, xy_right: (..., 2) pixel coords in the rectified pair.
        Returns (..., 3) points in the left camera frame (metres).
        Disparity is clamped to a small positive floor so padded/invalid
        rows produce finite garbage instead of inf/nan (mask downstream).
        """
        xy_left = jnp.asarray(xy_left)
        d = xy_left[..., 0] - jnp.asarray(xy_right)[..., 0]
        d = jnp.maximum(d, 1e-3)
        Z = self.fx * self.baseline / d
        X = (xy_left[..., 0] - self.cx) * Z / self.fx
        Y = (xy_left[..., 1] - self.cy) * Z / self.fy
        return jnp.stack([X, Y, Z], -1)

    def project(self, X):
        """Project left-frame points (...,3) to ((ul,vl),(ur,vr)).

        Z is clamped away from 0 so invalid rows stay finite.
        """
        X = jnp.asarray(X)
        Z = jnp.where(jnp.abs(X[..., 2]) < 1e-6,
                      jnp.sign(X[..., 2]) * 1e-6 + 1e-12, X[..., 2])
        ul = self.fx * X[..., 0] / Z + self.cx
        vl = self.fy * X[..., 1] / Z + self.cy
        ur = self.fx * (X[..., 0] - self.baseline) / Z + self.cx
        vr = vl
        return jnp.stack([ul, vl], -1), jnp.stack([ur, vr], -1)

    def project4(self, X):
        """(...,3) -> (...,4) stacked [ul, vl, ur, vr] — the BA measurement
        layout of `sba_solver.cpp:57-86`."""
        l, r = self.project(X)
        return jnp.concatenate([l, r], -1)

    def in_view(self, X, margin=0.0, min_z=0.1):
        """Visibility mask for left-frame points in both cameras."""
        l, r = self.project(X)
        def inside(p):
            return ((p[..., 0] >= margin) & (p[..., 0] <= self.width - 1 - margin)
                    & (p[..., 1] >= margin) & (p[..., 1] <= self.height - 1 - margin))
        return inside(l) & inside(r) & (jnp.asarray(X)[..., 2] > min_z)


def kitti_rig() -> StereoRig:
    """KITTI odometry sequence 00-02 rectified geometry (P0 grayscale)."""
    return StereoRig.create(fx=718.856, fy=718.856, cx=607.1928, cy=185.2157,
                            baseline=0.5371657, width=1241, height=376)


def bumblebee_rig() -> StereoRig:
    """A Bumblebee-like 1024×768 rig (the reference's camera; calibration
    values lived on the ROS parameter server, these are representative)."""
    return StereoRig.create(fx=900.0, fy=900.0, cx=511.5, cy=383.5,
                            baseline=0.12, width=1024, height=768)
