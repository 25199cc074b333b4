"""Voxelizer + flood-fill tests.

The analytic meshes and expected grids replicate the behavioral spec of the
reference's voxelization_test.py (exact expected grids for plain,
conservative, and sub-grid voxelization, and for interior filling).
"""

import numpy as np
import numpy.testing as tt
import jax.numpy as jnp

from corenet_tpu import geom, voxel


def _create_cube_mesh(d: float) -> np.ndarray:
  """A cube slightly larger than the center voxel of a 3x3x3 grid."""
  m, x = d, 3 - d
  cube = [
      [[m, m, m], [m, x, m], [m, m, x]],
      [[m, x, x], [m, x, m], [m, m, x]],
      [[x, m, m], [x, x, m], [x, m, x]],
      [[x, x, x], [x, x, m], [x, m, x]],

      [[m, m, m], [m, m, x], [x, m, m]],
      [[x, m, x], [m, m, x], [x, m, m]],
      [[m, x, m], [m, x, x], [x, x, m]],
      [[x, x, x], [m, x, x], [x, x, m]],

      [[m, m, m], [m, x, m], [x, m, m]],
      [[x, x, m], [m, x, m], [x, m, m]],
      [[m, m, x], [m, x, x], [x, m, x]],
      [[x, x, x], [m, x, x], [x, m, x]],
  ]
  return np.array(cube, np.float32)


def test_voxelizes_diagonal_quad():
  diagonal_quad = np.array([
      [[0, 0, 0], [1, 0, 1], [0, 1, 0]],
      [[1, 0, 1], [0, 1, 0], [1, 1, 1]],
  ], np.float32)
  expected = np.zeros([4, 4, 4], np.float32)
  for z in range(4):
    expected[z, :, z] = 1  # grid[z, y, x] = 1 iff x == z

  grid = voxel.voxelize_mesh(diagonal_quad, [2], (4, 4, 4),
                             geom.scale([4, 4, 4]),
                             image_resolution_multiplier=16)
  grid = voxel.fill_inside_voxels(grid)
  tt.assert_array_equal(np.asarray(grid), expected[None])


def test_conservative_voxelization():
  cube = _create_cube_mesh(99 / 100.0)
  grid = voxel.voxelize_mesh(cube, [12], (3, 3, 3), geom.scale([1, 1, 1]),
                             image_resolution_multiplier=1)
  e = np.zeros([3, 3, 3], np.float32)
  e[1, 1, [0, 2]] = e[1, [0, 2], 1] = e[[0, 2], 1, 1] = 1
  tt.assert_array_equal(np.asarray(grid), e[None])

  grid = voxel.voxelize_mesh(cube, [12], (3, 3, 3), geom.scale([1, 1, 1]),
                             image_resolution_multiplier=1,
                             conservative_rasterization=True)
  e = np.ones([3, 3, 3], np.float32)
  e[1, 1, 1] = 0
  tt.assert_array_equal(np.asarray(grid), e[None])


def test_sub_grid_voxelization():
  cube = _create_cube_mesh(99 / 100.0)
  grid = voxel.voxelize_mesh(cube, [12], (3, 3, 3), geom.scale([1, 1, 1]),
                             sub_grid_sampling=True,
                             image_resolution_multiplier=9,
                             conservative_rasterization=True)
  grid = voxel.fill_inside_voxels(grid)
  e = np.zeros([1, 7, 7, 7], np.float32)
  e[0, 2:5, 2:5, 2:5] = 1
  tt.assert_array_equal(np.asarray(grid), e)
  grid = voxel.get_sub_grid_centers(grid)
  e = np.zeros([1, 3, 3, 3], np.float32)
  e[0, 1, 1, 1] = 1
  tt.assert_array_equal(np.asarray(grid), e)

  # Multi-mesh with per-mesh transforms.
  cubes = np.concatenate([cube, cube - 0.5])
  transf = np.stack([np.asarray(geom.translate([-0.5, 0, 0])),
                     np.asarray(geom.translate([0.5, 1, 1]))])
  grid = voxel.voxelize_mesh(cubes, [12, 12], (3, 3, 3), transf,
                             sub_grid_sampling=True,
                             image_resolution_multiplier=9,
                             conservative_rasterization=True)
  grid = voxel.fill_inside_voxels(grid)
  grid = np.asarray(voxel.get_sub_grid_centers(grid))
  e1 = np.zeros([3, 3, 3], np.float32)
  e1[1, 1, [0, 1]] = 1
  tt.assert_array_equal(grid[0], e1)
  e2 = np.zeros([3, 3, 3], np.float32)
  e2[1, [1, 2], 1] = e2[2, [1, 2], 1] = 1
  tt.assert_array_equal(grid[1], e2)


_GRID1 = np.array([
    [[1, 1, 1, 1], [1, 1, 1, 1], [1, 1, 1, 1], [1, 1, 1, 1]],
    [[1, 1, 1, 1], [1, 0, 0, 1], [1, 0, 0, 1], [1, 1, 1, 1]],
    [[1, 1, 1, 1], [1, 0, 0, 1], [1, 0, 0, 1], [1, 1, 1, 1]],
    [[1, 1, 1, 1], [1, 1, 1, 1], [1, 1, 1, 1], [1, 1, 1, 1]],
], np.float32)

_GRID2 = np.array([
    [[1, 1, 1, 0], [1, 1, 1, 0], [1, 1, 1, 0], [0, 0, 0, 0]],
    [[1, 1, 1, 0], [1, 0, 1, 0], [1, 1, 1, 0], [0, 0, 0, 0]],
    [[1, 1, 1, 0], [1, 1, 1, 0], [1, 1, 1, 0], [0, 0, 0, 0]],
    [[0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]],
], np.float32)


def _expected_filled():
  e1 = _GRID1.copy()
  e1[e1 == 0] = 1
  e2 = _GRID2.copy()
  e2[1, 1, 1] = 1
  return np.stack([e1, e2])


def test_fill_cube_regions():
  out = voxel.fill_inside_voxels(jnp.asarray(np.stack([_GRID1, _GRID2])))
  tt.assert_array_equal(np.asarray(out), _expected_filled())


def test_fill_uint8():
  inp = jnp.asarray(np.stack([_GRID1, _GRID2]).astype(np.uint8))
  out = voxel.fill_inside_voxels(inp)
  assert out.dtype == jnp.uint8
  tt.assert_array_equal(np.asarray(out), _expected_filled().astype(np.uint8))


def test_fill_c_shape_not_filled():
  """An empty pocket with an opening to the boundary must NOT be filled."""
  g = np.ones([1, 5, 5, 5], np.float32)
  g[0, 1:4, 1:4, 1:4] = 0  # cavity
  g[0, 2, 2, 4] = 0
  g[0, 2, 2, 3] = 0  # tunnel from cavity to the x=4 boundary... x=4 is open
  out = np.asarray(voxel.fill_inside_voxels(jnp.asarray(g)))
  # The cavity is connected to the boundary through the tunnel → unchanged.
  tt.assert_array_equal(out, g)

  # Seal the tunnel → cavity becomes interior and is filled.
  g2 = g.copy()
  g2[0, 2, 2, 4] = 1
  out2 = np.asarray(voxel.fill_inside_voxels(jnp.asarray(g2)))
  assert out2.min() == 1  # everything filled


def test_fill_winding_tunnel():
  """Fixpoint iteration must follow multi-turn tunnels."""
  g = np.ones([1, 7, 7, 7], np.float32)
  # Carve a winding empty tunnel from the boundary to the center.
  path = [(0, 1, 1), (1, 1, 1), (2, 1, 1), (2, 2, 1), (2, 3, 1),
          (3, 3, 1), (4, 3, 1), (4, 3, 2), (4, 3, 3), (3, 3, 3)]
  for z, y, x in path:
    g[0, z, y, x] = 0
  out = np.asarray(voxel.fill_inside_voxels(jnp.asarray(g)))
  tt.assert_array_equal(out, g)  # tunnel reaches boundary → stays empty


def test_compose_batch_grid():
  m = np.zeros([3, 2, 2, 2], np.float32)
  m[0, 0, 0, 0] = 1
  m[1, 0, 0, 0] = 1  # overlaps mesh 0 in batch 0
  m[1, 1, 1, 1] = 1
  m[2, 0, 1, 0] = 1
  out = voxel.compose_batch_grid(
      jnp.asarray(m), jnp.asarray([0, 0, 1], np.int32),
      jnp.asarray([1, 2, 7], np.int32), batch_size=2)
  out = np.asarray(out)
  assert out.dtype == np.int32
  assert out[0, 0, 0, 0] == 2  # max over overlapping meshes
  assert out[0, 1, 1, 1] == 2
  assert out[1, 0, 1, 0] == 7
  assert out.sum() == 2 + 2 + 7


def _labyrinth_grid(n=32, rings=6):
  """Solid n³ block with a carved ring-labyrinth corridor open to the
  boundary: the path from the entrance to the innermost ring crosses
  every ring through alternating gaps — far more than 6 turns."""
  yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
  dist = np.minimum.reduce([yy, xx, n - 1 - yy, n - 1 - xx])
  wall = np.ones((n, n), bool)
  for k in range(rings):
    wall[dist == 2 * k + 1] = False           # ring corridors
  wall[0, n // 2] = False                     # entrance at the boundary
  for k in range(rings - 1):                  # alternating gaps
    c = 2 * k + 4 if k % 2 == 0 else n - 5 - 2 * k
    wall[2 * k + 2, c] = False
  # The corridor lives in a z-slab: labyrinth slices at z in [8, 24).
  g = np.ones((n, n, n), np.int32)
  g[8:24] = np.where(wall, 1, 0)[None, :, :]
  return g[None]  # [1, D, H, W]


def test_static_fill_underfill_detected():
  """A >6-turn labyrinth under-fills with the 6-round static fill — and
  static_rounds_converged DETECTS it (VERDICT r3 #8); enough rounds
  match the adaptive fixpoint; normal shapes converge well within 6."""
  from corenet_tpu.voxel.fill import static_rounds_converged
  g = jnp.asarray(_labyrinth_grid())
  adaptive = np.asarray(voxel.fill_inside_voxels(g))
  static6 = np.asarray(voxel.fill_inside_voxels(g, fill_rounds=6))
  wrong = int((static6 != adaptive).sum())
  assert wrong > 0, "labyrinth did not exceed 6 turns"
  assert not bool(static_rounds_converged(g, 6))
  assert bool(static_rounds_converged(g, 64))
  tt.assert_array_equal(
      np.asarray(voxel.fill_inside_voxels(g, fill_rounds=64)), adaptive)

  # A hollow cube (the realistic case) converges within 6 rounds.
  cube = np.zeros((1, 16, 16, 16), np.int32)
  cube[:, 4:12, 4:12, 4:12] = 1
  cube[:, 5:11, 5:11, 5:11] = 0
  assert bool(static_rounds_converged(jnp.asarray(cube), 6))
