"""corenet_tpu: a TPU-native (JAX/XLA/Pallas/pjit) single-image → 3D
voxel-grid reconstruction framework, with the capabilities of
google-research/corenet.

Layer map (bottom → top):
  utils/     file system, flags, misc helpers, logging
  geom/      4x4 transform algebra (pure jnp, vmappable)
  voxel/     triangle voxelizer, interior flood fill, sub-grid sampling
  ops/       Pallas TPU kernels for hot ops
  models/    flax modules: ResNet-50, BatchRenorm, decoder, skip-gather
  config/    typed dataclass configs ⇄ JSON5, templates, CLI overrides
  data/      scene/mesh NPZ datasets, deterministic sharded sampling
  parallel/  device mesh + sharding helpers
  train/     train state, jitted train step, checkpoints, pipeline
  eval/      inference fns, super-resolution, voxel metrics, eval pipeline
  viz/       host-side software renderer for qualitative results
  cli/       entry points (train / eval / tools)
  cc/        native C++ runtime pieces (flood-fill + voxelizer oracle)
"""

__version__ = "0.1.0"
