"""aprilslam_tpu — a TPU-native AprilTag SLAM framework.

Built from scratch in JAX/XLA/Pallas with the full capability surface of the
reference AprilSLAM system (mikostrzewa/AprilSLAM): batched AprilTag detection,
planar PnP pose estimation, a tag-landmark SLAM backend (transform chaining for
reference parity plus sliding-window bundle adjustment and pose-graph
optimization), an on-device simulator with an analytic ground-truth oracle,
evaluation/logging/analysis tooling, camera calibration, and multi-chip scaling
via jax.sharding meshes.
"""

__version__ = "0.1.0"
