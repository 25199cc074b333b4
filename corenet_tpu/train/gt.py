"""On-device ground-truth voxelization — inside the jitted train step.

This is the TPU-native replacement for the reference's GT data path
(/root/reference/src/corenet/data/batched_example.py:121-197:
GL rasterize → CUDA flood fill → per-mesh Python label loop, with host⇄GPU
copies in between). Here the whole thing is a jittable function of padded,
static-shape, per-scene buffers, so it fuses into the training step and
shards trivially over the 'data' mesh axis (each device voxelizes its own
scenes; no cross-device traffic).

Per-scene layout (produced by data/batching.py):
  triangles      float32[T, 3, 3]   view-space, padded
  tri_mesh_slot  int32[T]           mesh slot within the scene
  tri_valid      bool[T]
  mesh_labels    int32[M]           voxel value per mesh slot (0 = padding)
  grid_offset    float32[3]         in-voxel sampling offset

The world→voxel transform is scale(max(D,H,W)) (cubic, like
batched_example.voxelize:157-160); the rasterizer gets it pre-composed
with translate(grid_offset − 0.5) so voxels are tested at their sampled
locations (batched_example.py:164-165).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from corenet_tpu.voxel import raster_fast
from corenet_tpu.voxel.fill import fill_inside_voxels
from corenet_tpu.voxel.voxelize import get_sub_grid_centers, voxelize_triangles


def voxelize_scene(triangles: jnp.ndarray,
                   tri_mesh_slot: jnp.ndarray,
                   tri_valid: jnp.ndarray,
                   mesh_labels: jnp.ndarray,
                   grid_offset: jnp.ndarray,
                   *,
                   resolution: Tuple[int, int, int],
                   sub_grid_sampling: bool = False,
                   image_resolution_multiplier: float = 4,
                   conservative_rasterization: bool = True,
                   projection_depth_multiplier: int = 1,
                   fill_inside: bool = True,
                   max_bbox_pixels=None,
                   fill_rounds=None) -> jnp.ndarray:
  """Voxelizes one scene into an int32[D, H, W] labeled grid.

  fill_rounds: static interior-fill round count (multi-process-safe mode,
  voxel/fill.py:_outside_mask); None = adaptive fixpoint."""
  d, h, w = resolution
  m = float(max(d, h, w))
  num_mesh_slots = mesh_labels.shape[0]

  # shifted_w2x = translate(grid_offset - 0.5) @ scale(m): scale then shift.
  shift = grid_offset - 0.5
  w2x = jnp.concatenate([
      jnp.concatenate([jnp.eye(3, dtype=jnp.float32) * m, shift[:, None]],
                      axis=1),
      jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32),
  ], axis=0)
  view2voxel = jnp.broadcast_to(w2x, (num_mesh_slots, 4, 4))

  mesh_grids = voxelize_triangles(
      triangles, tri_mesh_slot, view2voxel, tri_valid,
      num_meshes=num_mesh_slots, resolution=resolution,
      sub_grid_sampling=sub_grid_sampling,
      image_resolution_multiplier=image_resolution_multiplier,
      conservative_rasterization=conservative_rasterization,
      projection_depth_multiplier=projection_depth_multiplier,
      max_bbox_pixels=max_bbox_pixels)

  if fill_inside:
    mesh_grids = fill_inside_voxels(mesh_grids, fill_rounds=fill_rounds)
  if sub_grid_sampling:
    mesh_grids = get_sub_grid_centers(mesh_grids)

  labeled = mesh_grids * mesh_labels.astype(jnp.float32)[:, None, None, None]
  return jnp.max(labeled, axis=0).astype(jnp.int32)


def _view2voxel_uniform(grid_offsets, m, num_mesh_slots):
  """Per-scene world→voxel transform scale(m) + grid-offset shift,
  broadcast over mesh slots (all slots share one matrix — the blocked
  rasterizer's uniform_mats contract). [B, M, 4, 4]."""
  b = grid_offsets.shape[0]
  shift = grid_offsets - 0.5  # [B, 3]
  w2x = jnp.concatenate([
      jnp.concatenate(
          [jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32) * m, (b, 3, 3)),
           shift[:, :, None]], axis=2),
      jnp.broadcast_to(jnp.array([[[0.0, 0.0, 0.0, 1.0]]], jnp.float32),
                       (b, 1, 4)),
  ], axis=1)  # [B, 4, 4]
  return jnp.broadcast_to(w2x[:, None], (b, num_mesh_slots, 4, 4))


def _blocked_batch(triangles, tri_mesh_slot, tri_valid, mesh_labels,
                   grid_offsets, *, resolution,
                   image_resolution_multiplier,
                   conservative_rasterization, fill_inside, fill_rounds,
                   label_dtype=jnp.uint8):
  """Fast blocked path (voxel/raster_fast.py): subdivided triangles →
  bit-packed Pallas block scatter → packed flood fill → labeled grid.

  label_dtype: uint8 when the caller attests the label values fit a byte
  (num_label_values ≤ 256 — every production dataset); int32 otherwise
  (same blocked scatter/fill, only the label compose pays full width)."""
  d, h, w = resolution
  m = float(max(d, h, w))
  b, num_mesh_slots = mesh_labels.shape
  view2voxel = _view2voxel_uniform(grid_offsets, m, num_mesh_slots)

  # uint8 end to end: the label values fit a byte (<=255 classes), and
  # every fine-resolution pass after the bit-packed voxelization (label
  # multiply, mesh max, the phase-loss permutation in train/step.py)
  # then moves 1/4 of the bytes the old f32/int32 chain did.
  mesh_grids = raster_fast.voxelize_blocked(
      triangles, tri_mesh_slot, view2voxel, tri_valid,
      num_meshes=num_mesh_slots, resolution=tuple(resolution),
      image_resolution_multiplier=int(image_resolution_multiplier),
      conservative_rasterization=conservative_rasterization,
      fill_inside=fill_inside,
      fill_rounds=fill_rounds,
      uniform_mats=True,  # all slots share the per-scene scale+shift
      dtype=label_dtype)  # [B, M, D, H, W]
  labeled = mesh_grids * mesh_labels.astype(label_dtype)[:, :, None, None,
                                                         None]
  return jnp.max(labeled, axis=1)


def packed_fgbg_eligible(batch: int, **kwargs) -> bool:
  """True when the bit-packed GT path (voxelize_batch_packed_fgbg) serves
  this voxelization configuration."""
  return raster_fast.blocked_eligible(
      resolution=kwargs["resolution"],
      sub_grid_sampling=kwargs.get("sub_grid_sampling", False),
      image_resolution_multiplier=kwargs.get(
          "image_resolution_multiplier", 4),
      projection_depth_multiplier=kwargs.get(
          "projection_depth_multiplier", 1),
      max_bbox_pixels=kwargs.get("max_bbox_pixels"),
      batch=batch)


def voxelize_batch_packed_fgbg(triangles, tri_mesh_slot, tri_valid,
                               mesh_labels, grid_offsets, **kwargs):
  """Binary (FG_BG) GT as a bit-packed grid: u32[B, H, W, NW], bit = 1
  where any valid mesh occupies-or-encloses the voxel.

  This never materializes the unpacked grid — the phase-loss training
  path consumes it directly through ops/phased_gt.py, replacing the
  ~9 ms/step XLA unpack + 10-D phase permute. Caller must have checked
  packed_fgbg_eligible. Returns (packed, v2x) like voxelize_batch."""
  d, h, w = kwargs["resolution"]
  m = float(max(d, h, w))
  b, num_mesh_slots = mesh_labels.shape
  v2x = jnp.broadcast_to(
      jnp.diag(jnp.array([m, m, m, 1.0], jnp.float32)), (b, 4, 4))

  view2voxel = _view2voxel_uniform(grid_offsets, m, num_mesh_slots)

  packed = raster_fast.voxelize_blocked_packed(
      triangles, tri_mesh_slot, view2voxel, tri_valid,
      num_meshes=num_mesh_slots, resolution=tuple(kwargs["resolution"]),
      image_resolution_multiplier=int(kwargs.get(
          "image_resolution_multiplier", 4)),
      conservative_rasterization=kwargs.get(
          "conservative_rasterization", True),
      fill_inside=kwargs.get("fill_inside", True),
      fill_rounds=kwargs.get("fill_rounds"),
      uniform_mats=True)  # u32[B, M, H, W, NW]
  # OR over valid mesh slots (FG_BG labels are 0/1 — data/batching.py
  # step_inputs): tiny, 32× less data than the unpacked grid.
  masked = jnp.where(mesh_labels[:, :, None, None, None] > 0, packed,
                     jnp.uint32(0))
  return jax.lax.reduce(masked, jnp.uint32(0), jnp.bitwise_or, (1,)), v2x


def voxelize_batch(triangles, tri_mesh_slot, tri_valid, mesh_labels,
                   grid_offsets, **kwargs):
  """Batched GT voxelization.

  Dispatches to the blocked fast path (voxel/raster_fast.py: Pallas block
  scatter + packed fill) when the configuration satisfies its contract —
  the production h5/h7/m7/m9 settings do — and otherwise falls back to a
  vmap of the general rasterizer.

  Returns (grid [B, D, H, W] — int32 on the general path, uint8 on the
  blocked fast path (label VALUES are identical; the fast path keeps the
  grid a byte so every fine-resolution pass after it moves 1/4 the
  data) — and v2x float32[B, 4, 4]), where v2x is the *unshifted*
  world→voxel transform scale(max(D,H,W)), matching the v2x_transform
  the reference stores on the batch (batched_example.py:197) and later
  inverts for the model's voxel→screen matrix (pipeline.py:220).

  num_label_values: pass the number of distinct label values (e.g.
  1 + num_classes) when it is statically known; it attests that every
  label fits a byte, enabling the uint8 compose (every fine-resolution
  pass after the bit-packed voxelization then moves 1/4 the data). When
  omitted, the blocked path still runs but composes labels in int32 —
  label values can be anything, never silently wrapped (ADVICE r3).
  """
  d, h, w = kwargs["resolution"]
  m = float(max(d, h, w))
  b = triangles.shape[0]
  v2x = jnp.broadcast_to(
      jnp.diag(jnp.array([m, m, m, 1.0], jnp.float32)), (b, 4, 4))

  num_label_values = kwargs.pop("num_label_values", None)
  if (num_label_values is None or num_label_values <= 256
     ) and raster_fast.blocked_eligible(
      resolution=kwargs["resolution"],
      sub_grid_sampling=kwargs.get("sub_grid_sampling", False),
      image_resolution_multiplier=kwargs.get(
          "image_resolution_multiplier", 4),
      projection_depth_multiplier=kwargs.get(
          "projection_depth_multiplier", 1),
      max_bbox_pixels=kwargs.get("max_bbox_pixels"),
      batch=b):
    grid = _blocked_batch(
        triangles, tri_mesh_slot, tri_valid, mesh_labels, grid_offsets,
        resolution=kwargs["resolution"],
        image_resolution_multiplier=kwargs.get(
            "image_resolution_multiplier", 4),
        conservative_rasterization=kwargs.get(
            "conservative_rasterization", True),
        fill_inside=kwargs.get("fill_inside", True),
        fill_rounds=kwargs.get("fill_rounds"),
        label_dtype=(jnp.uint8 if num_label_values is not None
                     else jnp.int32))
    return grid, v2x

  fn = functools.partial(voxelize_scene, **kwargs)
  grid = jax.vmap(fn)(triangles, tri_mesh_slot, tri_valid, mesh_labels,
                      grid_offsets)
  return grid, v2x
