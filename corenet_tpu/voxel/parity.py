"""Parity (ray-crossing) voxelization — scatter-free, fill-free GT.

The reference's GT pipeline approximates "is each voxel's sample point
inside the object" by rasterizing the shell at image_resolution_multiplier
× resolution and flood-filling enclosed cavities (VoxelizationConfig
docstring, configuration.py:96-116). For a closed mesh that predicate has
an exact, TPU-shaped answer: a sample point is inside iff a +z ray from it
crosses the surface an odd number of times.

Key trick: parity is XOR-linear. A crossing at height z* above a column
flips the insideness of every voxel with z + oz < z*, i.e. contributes the
prefix bitmask (1 << bin) − 1 with bin = ceil(z* − oz). Per column the
occupancy is the XOR of these masks over all triangles — held as
⌈D/32⌉ uint32 words and reduced with pure bitwise VPU ops. No scatter, no
sort, no flood fill, no triangle subdivision, no sampling windows.

Semantics: exact center-point sampling. Differs from rasterize+fill on
"grazed" voxels (surface touches the voxel but the sample point is
outside — the rasterized shell marks them, parity does not), and requires
closed meshes (rasterize+fill tolerates small holes). Use this for fast
training GT; use voxel/voxelize.py + fill where bit-parity with the
reference pipeline matters (evals). image_resolution_multiplier does not
apply — sampling is exact.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from corenet_tpu.utils import misc


@functools.partial(
    jax.jit,
    static_argnames=("num_mesh_slots", "resolution", "chunk_size"))
def parity_voxelize_batch(
    triangles: jnp.ndarray,       # float32[B, T, 3, 3] view space
    tri_mesh_slot: jnp.ndarray,   # int32[B, T]
    tri_valid: jnp.ndarray,       # bool[B, T]
    mesh_labels: jnp.ndarray,     # int32[B, M]
    grid_offsets: jnp.ndarray,    # float32[B, 3]
    *,
    num_mesh_slots: int,
    resolution: Tuple[int, int, int],
    chunk_size: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Returns (grid int32[B, D, H, W], v2x float32[B, 4, 4])."""
  d, h, w = resolution
  m = float(max(d, h, w))
  b, t_total = triangles.shape[:2]
  n_mesh = num_mesh_slots
  num_words = (d + 31) // 32

  # Voxel frame: v = view·m + (offset − 0.5); sample columns at
  # (x + ox, y + oy), insideness threshold at z + oz.
  shift = grid_offsets - 0.5
  v = triangles * m + shift[:, None, None, :]

  if chunk_size is None:
    chunk_size = max(8, min(t_total, (1 << 22) // max(h * w, 1)))
  num_chunks = misc.round_up(t_total, chunk_size) // chunk_size
  pad = num_chunks * chunk_size - t_total
  if pad:
    v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    tri_mesh_slot = jnp.pad(tri_mesh_slot, ((0, 0), (0, pad)))
    tri_valid = jnp.pad(tri_valid, ((0, 0), (0, pad)))

  ys = jnp.arange(h, dtype=jnp.float32)
  xs = jnp.arange(w, dtype=jnp.float32)
  gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
  cols_x = gx.reshape(1, -1)  # [1, P]
  cols_y = gy.reshape(1, -1)

  # Simulation-of-simplicity: a deterministic irrational sub-sample-scale
  # ray perturbation breaks exact edge/vertex hits (e.g. the voxel-center
  # lattice landing on a face's shared diagonal), which strict one-sided
  # tests would otherwise drop from the parity count. ~1e-4 voxels: far
  # below the GT's spatial precision.
  _EPS_X = 6.1035156e-05 * 0.7548777
  _EPS_Y = 6.1035156e-05 * 0.5698402

  def scene(vi, slot, valid, off_i):
    px = cols_x + off_i[0] + _EPS_X
    py = cols_y + off_i[1] + _EPS_Y

    def chunk_words(c, acc):
      tri = jax.lax.dynamic_slice_in_dim(vi, c * chunk_size, chunk_size)
      t_slot = jax.lax.dynamic_slice_in_dim(slot, c * chunk_size, chunk_size)
      t_valid = jax.lax.dynamic_slice_in_dim(valid, c * chunk_size,
                                             chunk_size)
      x0, y0, z0 = tri[:, 0, 0, None], tri[:, 0, 1, None], tri[:, 0, 2, None]
      x1, y1, z1 = tri[:, 1, 0, None], tri[:, 1, 1, None], tri[:, 1, 2, None]
      x2, y2, z2 = tri[:, 2, 0, None], tri[:, 2, 1, None], tri[:, 2, 2, None]

      w0 = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
      w1 = (x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)
      w2 = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
      area = w0 + w1 + w2
      # Strict one-sided coverage: a ray through a shared edge counts for
      # exactly one adjacent triangle in exact arithmetic; voxel-center
      # rays virtually never hit mesh edges exactly in practice.
      cover = (((w0 > 0) & (w1 > 0) & (w2 > 0)) |
               ((w0 < 0) & (w1 < 0) & (w2 < 0)))
      cover &= t_valid[:, None]
      inv_area = 1.0 / jnp.where(area == 0, 1.0, area)
      zstar = (w0 * z0 + w1 * z1 + w2 * z2) * inv_area

      # Crossing flips voxels z < z* − oz ⇒ prefix mask of length
      # bin = ceil(z* − oz) ∈ [0, D].
      bins = jnp.clip(jnp.ceil(zstar - off_i[2]), 0.0, float(d))
      bins = bins.astype(jnp.int32)  # [C, P]

      new = []
      for mesh in range(n_mesh):
        sel = cover & (t_slot[:, None] == mesh)
        bm = jnp.where(sel, bins, 0)
        words = []
        for k in range(num_words):
          lo = 32 * k
          rel = jnp.clip(bm - lo, 0, 32)
          # (1 << rel) − 1 with rel ∈ [0, 32]; rel = 32 ⇒ all ones.
          word = jnp.where(
              rel >= 32, jnp.uint32(0xFFFFFFFF),
              (jnp.uint32(1) << rel.astype(jnp.uint32)) - jnp.uint32(1))
          # XOR-reduce over the chunk's triangles.
          words.append(jax.lax.reduce(word, jnp.uint32(0),
                                      jax.lax.bitwise_xor, [0]))
        new.append(jnp.stack(words, axis=0))  # [num_words, P]
      return acc ^ jnp.stack(new, axis=0)  # [M, num_words, P]

    acc = jnp.zeros((n_mesh, num_words, h * w), jnp.uint32)
    acc = jax.lax.fori_loop(0, num_chunks, chunk_words, acc)

    # Unpack bits → occupancy [M, D, H, W].
    z_ids = jnp.arange(d, dtype=jnp.int32)
    word_idx = z_ids // 32
    bit_idx = (z_ids % 32).astype(jnp.uint32)
    per_z = acc[:, word_idx, :]  # [M, D, P]
    bits = (per_z >> bit_idx[None, :, None]) & jnp.uint32(1)
    return bits.astype(jnp.bool_).reshape(n_mesh, d, h, w)

  inside = jax.vmap(scene)(v, tri_mesh_slot, tri_valid, grid_offsets)
  labeled = inside.astype(jnp.float32) * mesh_labels.astype(
      jnp.float32)[:, :, None, None, None]
  grid = jnp.max(labeled, axis=1).astype(jnp.int32)
  v2x = jnp.broadcast_to(
      jnp.diag(jnp.array([m, m, m, 1.0], jnp.float32)), (b, 4, 4))
  return grid, v2x
