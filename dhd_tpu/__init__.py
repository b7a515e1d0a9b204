"""dhd_tpu — a TPU-native JAX/XLA/Pallas rebuild of DHD (Deep Height Decoupling).

DHD (arXiv 2409.07972, reference repo yanzq95/DHD) is a vision-only 3D semantic
occupancy prediction system for Occ3D-nuScenes.  This package re-implements the
full framework TPU-first:

- camera geometry + frustum lifting as pure jnp (``dhd_tpu.geometry``)
- the BEVPoolv2-style frustum->voxel pooling as fused segment-sum / Pallas
  kernels instead of CUDA scatter kernels (``dhd_tpu.ops``)
- all sub-networks (ResNet / FPN / DepthNet / HeightNet / UNet / SFA /
  occupancy head) as flax.linen modules in NHWC layout (``dhd_tpu.nn``)
- model assemblies (DHD-S single frame, DHD-M/L temporal stereo)
  (``dhd_tpu.models``)
- losses, training step (pjit data parallel over a ``jax.sharding.Mesh``),
  EMA, schedules (``dhd_tpu.losses``, ``dhd_tpu.train``)
- evaluation metrics: mIoU confusion matrix, RayIoU DDA (``dhd_tpu.eval``)
- data pipeline for nuScenes infos + synthetic fixtures (``dhd_tpu.data``)
- torch checkpoint conversion (``dhd_tpu.io``)
"""

__version__ = "0.1.0"
