"""Composition of per-mesh binary grids into labeled batch grids.

Replaces the reference's per-mesh Python loop
(/root/reference/src/corenet/data/batched_example.py:188-196) with a single
vectorized scatter-max: out[b] = max over meshes of batch b of
(label(mesh) * grid(mesh)).
"""

from __future__ import annotations

import jax.numpy as jnp


def compose_batch_grid(mesh_grids: jnp.ndarray,
                       mesh_batch_index: jnp.ndarray,
                       mesh_labels: jnp.ndarray,
                       batch_size: int) -> jnp.ndarray:
  """Composes per-mesh grids into per-batch labeled grids.

  Args:
    mesh_grids: float32[M, D, H, W], binary occupancy per mesh.
    mesh_batch_index: int32[M], batch element each mesh belongs to.
      Padded meshes may use an out-of-range index (e.g. batch_size) and
      are dropped.
    mesh_labels: int32[M] or float32[M], the voxel value for each mesh
      (mesh index + 1, semantic class, or 1).
    batch_size: Number of batch elements.

  Returns:
    int32[batch_size, D, H, W].
  """
  assert mesh_grids.ndim == 4
  labeled = mesh_grids * mesh_labels.astype(jnp.float32)[:, None, None, None]
  out = jnp.zeros((batch_size,) + mesh_grids.shape[1:], jnp.float32)
  out = out.at[mesh_batch_index].max(labeled, mode="drop")
  return out.astype(jnp.int32)
