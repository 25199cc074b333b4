"""Ray-traced skip connection: project voxel centers into a 2D feature map
and gather per-voxel features.

Semantics match the reference SampleGrid2d
(/root/reference/src/corenet/model/ray_traced_skip_connection.py:53-144)
exactly, including its quirks:

* pixel indices are computed with *truncation toward zero* (torch
  `.to(int64)`), not floor — so projected x in (-1, 0) reads pixel 0;
* nearest-pixel integer gather (no bilinear filtering);
* a 1-pixel pad detects out-of-image voxels, which read `outside_value`;
* voxels behind the camera (pre-division z < 0) read `outside_value`.

Layouts are channel-last: 2D map [B, H, W, C], output [B, D, Hg, Wg, C].
The projection is a batched matmul (MXU) and the gather one
`take_along_axis` per skip — XLA lowers it to a single gather; a fused
Pallas variant lives in ops/ for the hot path.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from corenet_tpu.models import layers
from corenet_tpu.ops import skip_gather as skip_gather_op
from corenet_tpu.parallel import kernel_sharding

# Minimum gathered-voxel count for the Pallas kernel; below this the XLA
# gather is negligible and not worth a kernel launch. None = auto.
_PALLAS_MIN_N = 32768


def _use_pallas(b: int, n: int, use_pallas: bool | None) -> bool:
  if use_pallas is not None:
    return use_pallas
  # Multi-device: under a registered mesh the kernel shard_maps over
  # 'data' (per batch shard) and over a non-trivial 'space' axis too
  # (per voxel shard; parallel/kernel_sharding.py).
  return (kernel_sharding.backend_ok()
          and kernel_sharding.kernel_mode(b, n=n, allow_space=True)
          is not None
          and n >= _PALLAS_MIN_N)


def sample_grid2d(grid2d: jnp.ndarray,
                  voxel_projection_matrix: jnp.ndarray,
                  voxel_sample_location: jnp.ndarray,
                  grid_resolution: Tuple[int, int, int],
                  outside_value: float = 0.0,
                  flip_x: bool = False,
                  flip_y: bool = False,
                  packed: bool = False,
                  use_pallas: bool | None = None) -> jnp.ndarray:
  """Samples a 2D grid at the projected centers of a 3D voxel grid.

  Args:
    grid2d: float32[B, H, W, C] (already channel-compressed).
    voxel_projection_matrix: float32[B, 4, 4], voxel → screen (NDC).
    voxel_sample_location: float32[B, 3], in-voxel sample offset (x, y, z).
    grid_resolution: (depth, height, width) of the output 3D grid.
    outside_value: fill value for out-of-image / behind-camera voxels.

  Returns:
    float32[B, depth, height, width, C].
  """
  b, h, w, c = grid2d.shape
  gd, gh, gw = grid_resolution

  # Voxel centers in (x, y, z) order, [D, H, W, 3]. In packed mode the
  # voxel enumeration is space-to-depth order ([D/2, H/2, W/2, 2, 2, 2]
  # flattened), so the gather's output IS the packed layout — the skip
  # features concat onto packed activations with zero reshuffling.
  zz, yy, xx = jnp.meshgrid(
      jnp.arange(gd, dtype=jnp.float32),
      jnp.arange(gh, dtype=jnp.float32),
      jnp.arange(gw, dtype=jnp.float32), indexing="ij")
  centers = jnp.stack([xx, yy, zz], axis=-1)
  if packed:
    assert gd % 2 == 0 and gh % 2 == 0 and gw % 2 == 0
    centers = centers.reshape(gd // 2, 2, gh // 2, 2, gw // 2, 2, 3)
    centers = jnp.transpose(centers, (0, 2, 4, 1, 3, 5, 6))
    centers = centers.reshape(gd // 2, gh // 2, gw // 2 * 8, 3)
  centers = centers[None] + voxel_sample_location[:, None, None, None, :]

  # Project: hom = M @ [x, y, z, 1].
  hom = jnp.einsum("bij,bdhwj->bdhwi", voxel_projection_matrix[:, :, :3],
                   centers) + voxel_projection_matrix[:, None, None, None, :, 3]
  camera_depth = hom[..., 2]
  ndc = hom[..., :2] / hom[..., 3:4]
  pc = ndc / 2.0 + 0.5  # [0,1]^2

  if flip_y:
    pc = pc * jnp.array([1.0, -1.0]) + jnp.array([0.0, 1.0])
  if flip_x:
    pc = pc * jnp.array([-1.0, 1.0]) + jnp.array([1.0, 0.0])

  # Truncation toward zero, exactly like torch .to(int64).
  pix = (pc * jnp.array([w, h], jnp.float32)).astype(jnp.int32)
  px = jnp.clip(pix[..., 0] + 1, 0, w + 1)
  py = jnp.clip(pix[..., 1] + 1, 0, h + 1)

  padded = jnp.pad(grid2d, ((0, 0), (1, 1), (1, 1), (0, 0)),
                   constant_values=outside_value)
  behind = camera_depth < 0
  n = px.size // b
  if _use_pallas(b, n, use_pallas):
    # Behind-camera voxels read pixel (0, 0) — a pad-ring cell holding
    # outside_value — so no post-gather select is needed, and their
    # gradient lands in the pad ring, which the pad adjoint discards.
    pxf = jnp.where(behind, 0, px).reshape(b, -1)
    pyf = jnp.where(behind, 0, py).reshape(b, -1)
    gathered = skip_gather_op.skip_gather(padded, pxf, pyf)
    behind = None
  else:
    flat = padded.reshape(b, (h + 2) * (w + 2), c)
    idx = (py * (w + 2) + px).reshape(b, -1)
    gathered = jnp.take_along_axis(flat, idx[:, :, None], axis=1)
  if packed:
    gathered = gathered.reshape(b, gd // 2, gh // 2, gw // 2, 8 * c)
    if behind is None:
      return gathered
    behind = behind.reshape(b, gd // 2, gh // 2, gw // 2, 8)
    behind = jnp.repeat(behind, c, axis=-1)
    return jnp.where(behind, jnp.asarray(outside_value, gathered.dtype),
                     gathered)
  gathered = gathered.reshape(b, gd, gh, gw, c)
  if behind is None:
    return gathered
  return jnp.where(behind[..., None],
                   jnp.asarray(outside_value, gathered.dtype), gathered)


class SampleGrid2d(nn.Module):
  """1×1 channel compression + projected gather (ray-traced skip)."""
  out_channels: int
  grid_resolution: Tuple[int, int, int]
  compute_dtype: Any = None
  packed: bool = False

  @nn.compact
  def __call__(self, grid2d: jnp.ndarray,
               voxel_projection_matrix: jnp.ndarray,
               voxel_sample_location: jnp.ndarray,
               outside_value: float = 0.0) -> jnp.ndarray:
    compressed = layers.Conv(features=self.out_channels, kernel_size=1,
                             ndim=2, compute_dtype=self.compute_dtype,
                             name="compress_channels")(grid2d)
    return sample_grid2d(compressed, voxel_projection_matrix,
                         voxel_sample_location, self.grid_resolution,
                         outside_value, packed=self.packed)
