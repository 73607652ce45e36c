"""cmdiad_tpu — TPU-native incomplete-multimodal industrial anomaly detection.

A from-scratch JAX/XLA/Pallas framework with the capabilities of CMDIAD
(arXiv:2405.13571): PatchCore/M3DM-style training-free anomaly detection over
MVTec 3D-AD (RGB image + organized XYZ point cloud), extended with MTFI
(Multi-modal Training, Few-modal Inference) cross-modal distillation so that a
single modality suffices at inference time.

Design principles (vs. the CUDA/torch reference at evenrose/CMDIAD):
  * static shapes everywhere — organized point clouds stay (B, H, W, 3) with a
    validity mask instead of variable-length nonzero filtering;
  * the full per-sample feature pipeline (ViT-B/8 + Point-MAE with FPS/KNN
    grouping + 3-NN interpolation + patch assembly) is one jitted XLA program;
  * memory banks are device arrays in HBM; nearest-neighbour scoring is a
    fused distance/top-k computation on the MXU;
  * multi-device scale comes from `jax.sharding.Mesh` + shard_map (data
    parallel eval, sharded banks, psum gradient training) rather than NCCL;
  * hot sequential kernels (farthest point sampling, greedy coreset) have
    Pallas TPU implementations with pure-jnp fallbacks.
"""

__version__ = "0.1.0"

from cmdiad_tpu.config import Config, method_preset  # noqa: F401
