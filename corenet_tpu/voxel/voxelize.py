"""Triangle-mesh voxelization — TPU-native, jittable, static shapes.

Re-implements, as a dense XLA program, the semantics of the reference's
OpenGL voxelizer (/root/reference/src/corenet/geometry/voxelization.py:32-164
plus shaders voxelize.geom:44-56 and voxelize.frag:29-58):

* Each triangle is transformed into voxel space by its mesh's `view2voxel`
  matrix, then rasterized by orthographic projection onto one of the three
  axis-aligned planes — the one maximizing the projected area (dominant
  normal axis, with the GLSL comparison/tie rules reproduced exactly).
* The projection plane is sampled at the centers of an R×R pixel grid,
  R = round(max(w, h, d * projection_depth_multiplier) *
  image_resolution_multiplier); per-axis sample spacing is
  full_range/R where full_range = (w, h, d * pdm).
* Each covered sample interpolates the full 3D voxel-space position
  barycentrically (affine, like the GL varying) and marks the voxel
  `floor(position)` — or, with sub-grid sampling, the cell of the 2R+1
  irregular grid per voxelize.frag:47-56.
* `conservative_rasterization` marks every pixel whose square overlaps the
  projected triangle (exact SAT test), with the position extrapolated at
  the pixel center on the triangle's plane — the effective behavior of
  NV_conservative_raster in the reference.

Instead of a `mesh_num_tri` ragged layout, the jittable core takes a
per-triangle mesh index and validity mask (static shapes; pad triangles
freely). Triangles are processed in fixed-size chunks with a fori_loop,
each chunk scatter-maxing fragments into the output grid; memory is
bounded by chunk_size * window² regardless of triangle count.

The per-triangle sampling window (`max_bbox_pixels`) must cover the
triangle's projected bbox; it defaults to the full image (always correct).
For large scenes, pre-subdivide triangles (see data/batching.py) and use a
small window — that is the production configuration.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from corenet_tpu.utils import misc

# Plane (u, v) coordinate axes for each dominant axis k (x=0, y=1, z=2).
# k=0 → (y, z); k=1 → (z, x); k=2 → (x, y). Mirrors the GLSL swizzles
# yzxw / zxyw / identity in voxelize.geom:52-55.
_PLANE_AXES = np.array([[1, 2], [2, 0], [0, 1]], np.int32)


def _dominant_axis(normals: jnp.ndarray) -> jnp.ndarray:
  """GLSL dominant-axis selection with exact comparison semantics."""
  a = jnp.abs(normals)
  ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
  is_x = (ax > ay) & (ax > az)
  is_y = (ay > ax) & (ay > az)
  return jnp.where(is_x, 0, jnp.where(is_y, 1, 2)).astype(jnp.int32)


def _edge(pu, pv, au, av, bu, bv):
  """2D edge function e(P; A→B) = (B-A) × (P-A)."""
  return (bu - au) * (pv - av) - (bv - av) * (pu - au)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_meshes", "resolution", "sub_grid_sampling",
        "image_resolution_multiplier", "conservative_rasterization",
        "projection_depth_multiplier", "max_bbox_pixels", "chunk_size"))
def voxelize_triangles(
    triangles: jnp.ndarray,          # float32[T, 3, 3]
    tri_mesh_index: jnp.ndarray,     # int32[T]
    view2voxel: jnp.ndarray,         # float32[num_meshes, 4, 4]
    tri_valid: jnp.ndarray,          # bool[T]
    *,
    num_meshes: int,
    resolution: Tuple[int, int, int],
    sub_grid_sampling: bool = False,
    image_resolution_multiplier: float = 4,
    conservative_rasterization: bool = False,
    projection_depth_multiplier: int = 1,
    max_bbox_pixels: Optional[int] = None,
    chunk_size: Optional[int] = None,
) -> jnp.ndarray:
  """Jittable voxelization core. Returns float32[num_meshes, D', H', W']."""
  depth, height, width = resolution
  irm = image_resolution_multiplier
  pdm = projection_depth_multiplier

  if sub_grid_sampling and int(irm) % 2 == 0:
    raise ValueError("image_resolution_multiplier must be odd with "
                     "sub_grid_sampling")
  if sub_grid_sampling and pdm != 1:
    raise ValueError("projection_depth_multiplier must be 1 with "
                     "sub_grid_sampling")

  image_res = int(round(max(width, height, depth * pdm) * irm))
  # Voxel-space full ranges per coordinate axis (x, y, z): the ortho
  # projection in the reference maps [0, w] × [0, h] × [0, d*pdm] to NDC.
  full_range = jnp.array([width, height, depth * pdm], jnp.float32)
  spacing = full_range / image_res  # sample spacing per axis

  if sub_grid_sampling:
    out_shape = (num_meshes, 2 * depth + 1, 2 * height + 1, 2 * width + 1)
  else:
    out_shape = (num_meshes, depth, height, width)

  t_total = triangles.shape[0]
  window = max_bbox_pixels if max_bbox_pixels is not None else image_res + 2
  window = min(window, image_res + 2)
  if chunk_size is None:
    chunk_size = max(1, min(t_total, (1 << 22) // max(window * window, 1)))
  num_chunks = misc.round_up(t_total, chunk_size) // chunk_size
  pad = num_chunks * chunk_size - t_total
  if pad:
    triangles = jnp.pad(triangles, ((0, pad), (0, 0), (0, 0)))
    tri_mesh_index = jnp.pad(tri_mesh_index, (0, pad))
    tri_valid = jnp.pad(tri_valid, (0, pad))

  plane_axes = jnp.asarray(_PLANE_AXES)

  def rasterize_chunk(grid, tris, mesh_idx, valid):
    c = tris.shape[0]
    mats = view2voxel[mesh_idx]  # [C, 4, 4]
    # Transform vertices to voxel space (w = 1; affine matrices here).
    v = jnp.einsum("cij,cvj->cvi", mats[:, :3, :3], tris) + mats[:, None, :3, 3]

    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    normal = jnp.cross(e1, e2)
    k = _dominant_axis(normal)  # [C]

    pu_axis = plane_axes[k, 0]  # [C]
    pv_axis = plane_axes[k, 1]
    su = spacing[pu_axis]  # [C] sample spacing along u
    sv = spacing[pv_axis]

    # Triangle vertex plane coordinates, [C, 3].
    vu = jnp.take_along_axis(v, pu_axis[:, None, None], axis=2)[..., 0]
    vv = jnp.take_along_axis(v, pv_axis[:, None, None], axis=2)[..., 0]

    # Pixel window anchored below the projected bbox. Clamped to pixel -1:
    # pixels below 0 do not exist on the render target, so a bbox hanging
    # off the image's low side must not drag the window away from the
    # pixels that do exist.
    iu0 = jnp.maximum(
        jnp.floor(vu.min(axis=1) / su).astype(jnp.int32) - 1, -1)
    iv0 = jnp.maximum(
        jnp.floor(vv.min(axis=1) / sv).astype(jnp.int32) - 1, -1)
    iu = iu0[:, None] + jnp.arange(window, dtype=jnp.int32)[None]  # [C, W]
    iv = iv0[:, None] + jnp.arange(window, dtype=jnp.int32)[None]
    in_image = ((iu[:, :, None] >= 0) & (iu[:, :, None] < image_res) &
                (iv[:, None, :] >= 0) & (iv[:, None, :] < image_res))

    # Sample-point plane coordinates (pixel centers), [C, W, W].
    pu = (iu.astype(jnp.float32) + 0.5) * su[:, None]
    pv = (iv.astype(jnp.float32) + 0.5) * sv[:, None]
    pu2 = pu[:, :, None]
    pv2 = pv[:, None, :]

    u0, u1, u2 = vu[:, 0, None, None], vu[:, 1, None, None], vu[:, 2, None, None]
    v0, v1, v2 = vv[:, 0, None, None], vv[:, 1, None, None], vv[:, 2, None, None]

    w0 = _edge(pu2, pv2, u1, v1, u2, v2)
    w1 = _edge(pu2, pv2, u2, v2, u0, v0)
    w2 = _edge(pu2, pv2, u0, v0, u1, v1)
    area2 = w0 + w1 + w2  # constant per triangle (signed double area)

    if conservative_rasterization:
      # Exact SAT triangle/pixel-square overlap. Edge tests: an affine edge
      # function's max over the square equals its center value plus
      # |∂e/∂u|·su/2 + |∂e/∂v|·sv/2. Axis tests: bbox overlap.
      sgn = jnp.sign(area2)
      half_u = su[:, None, None] * 0.5
      half_v = sv[:, None, None] * 0.5

      def edge_ok(w, a_u, a_v, b_u, b_v):
        # e(P; A→B): ∂e/∂u = -(bv-av), ∂e/∂v = (bu-au)
        du = -(b_v - a_v)
        dv = (b_u - a_u)
        slack = jnp.abs(du) * half_u + jnp.abs(dv) * half_v
        return sgn * w + slack >= 0

      cov = (edge_ok(w0, u1, v1, u2, v2) &
             edge_ok(w1, u2, v2, u0, v0) &
             edge_ok(w2, u0, v0, u1, v1))
      bbox_ok = ((pu2 + half_u >= jnp.minimum(jnp.minimum(u0, u1), u2)) &
                 (pu2 - half_u <= jnp.maximum(jnp.maximum(u0, u1), u2)) &
                 (pv2 + half_v >= jnp.minimum(jnp.minimum(v0, v1), v2)) &
                 (pv2 - half_v <= jnp.maximum(jnp.maximum(v0, v1), v2)))
      cov = cov & bbox_ok
    else:
      # Watertightness: adjacent triangles compute their edge functions
      # independently in f32, so a sample exactly on a shared edge can
      # test (barely) outside BOTH — a crack that lets the interior fill
      # leak. An area-relative epsilon (scale-invariant, ~1e-4 of a
      # pixel wide geometrically) closes cracks; shared subdivision
      # midpoints are bitwise identical so the band always covers them.
      eps = 1e-4 * jnp.abs(area2)
      pos_side = (w0 >= -eps) & (w1 >= -eps) & (w2 >= -eps)
      neg_side = (w0 <= eps) & (w1 <= eps) & (w2 <= eps)
      cov = pos_side | neg_side

    nz_area = jnp.abs(area2) > 0
    cov = cov & in_image & nz_area & valid[:, None, None]

    # Barycentric position interpolation (extrapolates on the triangle
    # plane for conservative out-of-triangle pixels, like GL varyings).
    inv_area = jnp.where(nz_area, 1.0 / jnp.where(nz_area, area2, 1.0), 0.0)
    b0 = w0 * inv_area
    b1 = w1 * inv_area
    b2 = w2 * inv_area
    pos = (b0[..., None] * v[:, None, None, 0] +
           b1[..., None] * v[:, None, None, 1] +
           b2[..., None] * v[:, None, None, 2])  # [C, W, W, 3]

    # Bounds check in voxel space (voxelize.frag:36-38).
    dims = jnp.array([width, height, depth], jnp.float32)
    in_bounds = jnp.all((pos >= 0) & (pos < dims), axis=-1)
    cov = cov & in_bounds

    if sub_grid_sampling:
      s = int(irm)
      vvx = jnp.floor(pos * s).astype(jnp.int32) + s // 2
      cc = vvx // s
      rr = (vvx % s == s - 1).astype(jnp.int32)
      cell = 2 * cc + rr  # (x, y, z) cell in the 2*dim+1 grid
    else:
      cell = jnp.floor(pos).astype(jnp.int32)

    mesh = jnp.broadcast_to(mesh_idx[:, None, None], cov.shape)
    # Out-of-coverage fragments get a far out-of-bounds index → dropped by
    # the scatter. (Negative indices would wrap under numpy semantics.)
    oob = jnp.full_like(cell[..., 0], 1 << 28)
    cx = jnp.where(cov, cell[..., 0], oob)
    cy = jnp.where(cov, cell[..., 1], oob)
    cz = jnp.where(cov, cell[..., 2], oob)
    grid = grid.at[mesh, cz, cy, cx].max(1.0, mode="drop")
    return grid

  def body(i, grid):
    sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i * chunk_size, chunk_size)
    return rasterize_chunk(grid, sl(triangles), sl(tri_mesh_index),
                           sl(tri_valid))

  grid = jnp.zeros(out_shape, jnp.float32)
  grid = jax.lax.fori_loop(0, num_chunks, body, grid)
  return grid


def voxelize_mesh(triangles,
                  mesh_num_tri,
                  resolution: Tuple[int, int, int],
                  view2voxel,
                  sub_grid_sampling: bool = False,
                  image_resolution_multiplier: float = 4,
                  conservative_rasterization: bool = False,
                  projection_depth_multiplier: int = 1,
                  max_bbox_pixels: Optional[int] = None) -> jnp.ndarray:
  """Host-friendly API mirroring the reference voxelize_mesh signature
  (/root/reference/src/corenet/geometry/voxelization.py:32-164).

  Args:
    triangles: float32[total_triangles, 3, 3].
    mesh_num_tri: int sequence [num_meshes]; triangles per mesh, in order.
    resolution: (depth, height, width).
    view2voxel: float32[4, 4] or float32[num_meshes, 4, 4].

  Returns:
    float32[num_meshes, D, H, W], or the (2D+1, 2H+1, 2W+1) irregular grid
    with sub_grid_sampling.
  """
  mesh_num_tri = np.asarray(mesh_num_tri, np.int64)
  num_meshes = int(mesh_num_tri.shape[0])
  tri_mesh_index = jnp.asarray(misc.dynamic_tile_np(mesh_num_tri))
  triangles = jnp.asarray(triangles, jnp.float32)
  assert triangles.shape[0] == int(mesh_num_tri.sum())

  view2voxel = jnp.asarray(view2voxel, jnp.float32)
  if view2voxel.ndim == 2:
    view2voxel = jnp.broadcast_to(view2voxel, (num_meshes, 4, 4))

  tri_valid = jnp.ones((triangles.shape[0],), bool)
  return voxelize_triangles(
      triangles, tri_mesh_index, view2voxel, tri_valid,
      num_meshes=num_meshes, resolution=tuple(resolution),
      sub_grid_sampling=sub_grid_sampling,
      image_resolution_multiplier=image_resolution_multiplier,
      conservative_rasterization=conservative_rasterization,
      projection_depth_multiplier=projection_depth_multiplier,
      max_bbox_pixels=max_bbox_pixels)


def get_sub_grid_centers(grid: jnp.ndarray) -> jnp.ndarray:
  """Occupancy at sub-grid centers: float32[B, 2D+1, 2H+1, 2W+1] → [B, D, H, W].

  Selects the odd-index cells, which hold the centers of the regular grid's
  voxels (voxelization.py:167-182).
  """
  return grid[:, 1::2, 1::2, 1::2]
