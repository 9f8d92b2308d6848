"""pi3_slam_tpu — a TPU-native visual SLAM / chunked 3D-reconstruction framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of urbste/Pi3_SLAM:

  * Pi3 visual-geometry transformer (DINOv2-L/14-reg encoder + alternating
    frame/global attention decoder) producing per-pixel world points, local
    camera-frame points, confidence, and per-frame camera poses.
  * MoGe-2 monocular metric depth for metric-scale recovery.
  * Chunked SLAM pipeline: chunk creation -> per-chunk SfM (batched bundle
    adjustment in JAX) -> Sim3 chunk-to-chunk alignment -> PLY/TUM export.

Design: models are pure functions over parameter pytrees, compiled once with
jit; bundle adjustment and Sim3 alignment are fixed-shape Gauss-Newton solvers
(vmap/jit) replacing the reference's Ceres/PyTheia C++ backend; multi-chip
scaling goes through jax.sharding.Mesh data parallelism over frames/chunks.
"""

__version__ = "0.2.0"
