"""scflow_tpu: a TPU-native 6DoF object-pose refinement framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
SCFlow (CVPR 2023, "Shape-Constraint Recurrent Flow for 6D Object Pose
Estimation"): recurrent flow-based pose refinement with a shape
constraint, BOP-style datasets/metrics, and data-parallel training over
TPU meshes.

Layout
------
- ``scflow_tpu.geometry``  — SE(3)/rotation math, projection, pose-induced flow, PnP.
- ``scflow_tpu.rendering`` — mesh loading + a JAX triangle rasterizer with Phong shading.
- ``scflow_tpu.models``    — RAFT encoder, correlation, ConvGRU, SCFlow decoder, refiners.
- ``scflow_tpu.ops``       — Pallas TPU kernels for the hot paths.
- ``scflow_tpu.losses``    — sequence-weighted flow/mask/point-matching losses.
- ``scflow_tpu.data``      — BOP dataset readers, crop/resize/pad pipeline, pose jitter.
- ``scflow_tpu.metrics``   — ADD(-S), AUC, reprojection metrics, BOP result writer.
- ``scflow_tpu.parallel``  — device mesh / sharding helpers, distributed bootstrap.
- ``scflow_tpu.training``  — config tree, optimizer, train/eval loops, checkpointing.
"""

__version__ = "0.1.0"
