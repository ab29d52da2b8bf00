"""front_end_tpu — a TPU-native stereo visual-odometry / SLAM front-end.

A ground-up JAX / XLA / Pallas re-design of the capabilities of the
`RyanEvanWolf/front_end` ROS package (reference at /root/reference):

- batched feature detection (FAST with adaptive grid thresholds, ORB, BRIEF,
  Hessian/DoG families) as dense TPU stencils / Pallas kernels,
- stereo + inter-frame descriptor matching as tiled MXU matmuls with
  epipolar / ROI gating masks,
- motion estimation (rigid Kabsch, essential matrix, RANSAC) as vmapped
  hypothesis batches,
- sliding-window tracking over a fixed-capacity landmark store,
- windowed stereo bundle adjustment as a Schur-complement Levenberg-Marquardt,
  shardable over a `jax.sharding.Mesh` (landmarks sharded, reduced camera
  system assembled with psum).

Everything is static-shaped: keypoint sets are padded to fixed capacities with
validity masks, replacing the reference's dynamic std::vector pipelines.
"""

__version__ = "0.1.0"

from front_end_tpu.geometry import se3, camera  # noqa: F401
