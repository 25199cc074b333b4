"""Native C++ ops: spec tests + fuzz parity against the XLA implementations
(the role of the reference's GPU==CPU parity test,
voxelization_test.py:234-248, with the native code as the oracle)."""

import numpy as np
import numpy.testing as tt
import jax.numpy as jnp
import pytest

from corenet_tpu import geom, voxel
from corenet_tpu.cc import native

from helpers import cube_mesh


def test_native_fill_matches_xla():
  rng = np.random.default_rng(0)
  grid = (rng.random((3, 12, 12, 12)) > 0.72).astype(np.float32)
  ours = np.asarray(voxel.fill_inside_voxels(jnp.asarray(grid)))
  theirs = native.fill_inside_voxels(grid)
  tt.assert_array_equal(ours, theirs)


def test_native_fill_dtypes():
  g = np.zeros((1, 4, 4, 4), np.uint8)
  g[0, 1:3, 1:3, 1:3] = 0  # all empty → nothing filled
  out = native.fill_inside_voxels(g)
  assert out.dtype == np.uint8
  assert out.sum() == 0
  g = np.ones((1, 4, 4, 4), np.int32)
  out = native.fill_inside_voxels(g)
  assert out.dtype == np.int32 and out.min() == 1


def test_native_voxelizer_cube_conservative():
  cube = cube_mesh(0.99, 2.01).reshape(12, 3, 3)
  grid = native.voxelize_triangles(
      cube, np.zeros(12, np.int32), 1, (3, 3, 3),
      image_resolution_multiplier=1, conservative_rasterization=True)
  e = np.ones([3, 3, 3], np.float32)
  e[1, 1, 1] = 0
  tt.assert_array_equal(grid[0], e)


@pytest.mark.parametrize("conservative", [False, True])
def test_native_voxelizer_fuzz_parity_with_xla(conservative):
  """Random triangle soups must voxelize identically in C++ and XLA."""
  rng = np.random.default_rng(42 + conservative)
  for trial in range(4):
    t = int(rng.integers(3, 24))
    tris = rng.random((t, 3, 3)).astype(np.float32) * 8 - 0.5
    num_meshes = 2
    mesh_idx = np.sort(rng.integers(0, num_meshes, t)).astype(np.int32)
    res = (8, 8, 8)
    irm = [2, 3][trial % 2]

    theirs = native.voxelize_triangles(
        tris, mesh_idx, num_meshes, res, image_resolution_multiplier=irm,
        conservative_rasterization=conservative)
    ours = np.asarray(voxel.voxelize_triangles(
        jnp.asarray(tris), jnp.asarray(mesh_idx),
        jnp.broadcast_to(jnp.eye(4), (num_meshes, 4, 4)),
        jnp.ones(t, bool), num_meshes=num_meshes, resolution=res,
        image_resolution_multiplier=irm,
        conservative_rasterization=conservative))
    mismatches = int((ours != theirs).sum())
    # Samples landing exactly on triangle edges may round differently in
    # f32 (XLA) vs f64 (C++); random soups should essentially never do so.
    assert mismatches == 0, f"trial {trial}: {mismatches} voxels differ"


def test_native_voxelizer_subgrid():
  cube = cube_mesh(0.99, 2.01)
  grid = native.voxelize_triangles(
      cube, np.zeros(12, np.int32), 1, (3, 3, 3),
      image_resolution_multiplier=9, conservative_rasterization=True,
      sub_grid_sampling=True)
  grid = native.fill_inside_voxels(grid)
  e = np.zeros([1, 7, 7, 7], np.float32)
  e[0, 2:5, 2:5, 2:5] = 1
  tt.assert_array_equal(grid, e)
