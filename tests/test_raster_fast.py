"""Blocked fast rasterizer + packed fill: exact equivalence with the
general rasterizer (voxel/voxelize.py) and dense fill (voxel/fill.py),
which themselves carry the reference-parity tests."""

import functools

import numpy as np
import numpy.testing as tt
import jax
import jax.numpy as jnp
import pytest

from corenet_tpu.data.batching import subdivide_triangles
from corenet_tpu.train import gt
from corenet_tpu.voxel import raster_fast
from corenet_tpu.voxel.fill import fill_inside_voxels
from corenet_tpu.voxel.packed import (
    _kog_down, _kog_up, _leading_ones, _trailing_ones, fill_inside_packed,
    pack_grid, unpack_grid,
)

from helpers import cube_mesh


def test_bit_helpers_brute_force():
  rng = np.random.default_rng(0)
  e = rng.integers(0, 2**32, 256, dtype=np.uint64).astype(np.uint32)
  e = np.concatenate([e, np.array([0, 0xFFFFFFFF, 1, 0x80000000],
                                  np.uint32)])
  to = np.asarray(_trailing_ones(jnp.asarray(e)))
  lo = np.asarray(_leading_ones(jnp.asarray(e)))
  for i, word in enumerate(e):
    bits = [(int(word) >> b) & 1 for b in range(32)]
    t_expect = 0
    for b in range(32):
      if not bits[b]:
        break
      t_expect |= 1 << b
    l_expect = 0
    for b in range(31, -1, -1):
      if not bits[b]:
        break
      l_expect |= 1 << b
    assert to[i] == t_expect, (hex(word), hex(to[i]), hex(t_expect))
    assert lo[i] == l_expect, (hex(word), hex(lo[i]), hex(l_expect))


def test_kogge_stone_brute_force():
  rng = np.random.default_rng(1)
  e = rng.integers(0, 2**32, 128, dtype=np.uint64).astype(np.uint32)
  r = rng.integers(0, 2**32, 128, dtype=np.uint64).astype(np.uint32) & e
  up = np.asarray(_kog_up(jnp.asarray(r), jnp.asarray(e)))
  down = np.asarray(_kog_down(jnp.asarray(r), jnp.asarray(e)))
  for i in range(len(e)):
    eb = [(int(e[i]) >> b) & 1 for b in range(32)]
    rb = [(int(r[i]) >> b) & 1 for b in range(32)]
    exp_up = list(rb)
    for b in range(1, 32):
      if eb[b] and exp_up[b - 1]:
        exp_up[b] = exp_up[b] or rb[b] or 1
    exp_dn = list(rb)
    for b in range(30, -1, -1):
      if eb[b] and exp_dn[b + 1]:
        exp_dn[b] = 1
    assert up[i] == sum(v << b for b, v in enumerate(exp_up))
    assert down[i] == sum(v << b for b, v in enumerate(exp_dn))


def test_pack_unpack_roundtrip():
  rng = np.random.default_rng(2)
  grid = (rng.random((2, 3, 64, 32, 32)) < 0.3).astype(np.float32)
  packed = pack_grid(jnp.asarray(grid))
  assert packed.shape == (2, 3, 32, 32, 2)
  back = np.asarray(unpack_grid(packed))
  tt.assert_array_equal(back, grid)


@pytest.mark.parametrize("shape", [(1, 32, 32, 32), (2, 64, 64, 64)])
def test_packed_fill_matches_dense(shape):
  rng = np.random.default_rng(3)
  # Random blobs plus a guaranteed closed box with a cavity.
  grid = (rng.random(shape) < 0.1).astype(np.float32)
  n, d, h, w = shape
  box = np.zeros((d, h, w), np.float32)
  box[4:20, 4:20, 4:20] = 1
  box[6:18, 6:18, 6:18] = 0  # cavity → must fill
  box[10, 10, 10] = 1
  grid[0] = np.maximum(grid[0], box)
  dense = np.asarray(fill_inside_voxels(jnp.asarray(grid)))
  packed = fill_inside_packed(pack_grid(jnp.asarray(grid)))
  tt.assert_array_equal(np.asarray(unpack_grid(packed)), dense)


def test_packed_fill_tunnel_stays_open():
  d = 32
  grid = np.zeros((1, d, d, d), np.float32)
  grid[0, 8:24, 8:24, 8:24] = 1
  grid[0, 10:22, 10:22, 10:22] = 0
  # Drill a tunnel from the cavity to the boundary.
  grid[0, 15:17, 15:17, :10] = 0
  grid[0, 14:18, 14:18, 8:10] = 0
  # Walls around the tunnel where it pierces the shell:
  dense = np.asarray(fill_inside_voxels(jnp.asarray(grid)))
  packed = np.asarray(
      unpack_grid(fill_inside_packed(pack_grid(jnp.asarray(grid)))))
  tt.assert_array_equal(packed, dense)


def _scene(num_scenes=2, m=32, irm=8, window=24, lo=0.28, hi=0.71):
  max_edge = (window - 4) / irm / m
  tris = subdivide_triangles(cube_mesh(lo, hi), max_edge)
  t = tris.shape[0]
  tri = np.zeros((num_scenes, t + 6, 3, 3), np.float32)
  tri[:, :t] = tris
  valid = np.zeros((num_scenes, t + 6), bool)
  valid[:, :t] = True
  slot = np.zeros((num_scenes, t + 6), np.int32)
  return tri, slot, valid


@pytest.mark.parametrize("conservative", [False, True])
def test_blocked_matches_general(conservative):
  m, irm, window = 32, 8, 24
  tri, slot, valid = _scene(m=m, irm=irm, window=window)
  b = tri.shape[0]
  labels = np.full((b, 1), 2, np.int32)
  offs = np.stack([np.full(3, 0.5, np.float32),
                   np.array([0.15, 0.6, 0.95], np.float32)])
  kwargs = dict(resolution=(m, m, m), image_resolution_multiplier=irm,
                conservative_rasterization=conservative,
                max_bbox_pixels=window)
  args = tuple(jnp.asarray(x) for x in (tri, slot, valid, labels, offs))
  assert raster_fast.blocked_eligible(
      resolution=(m, m, m), sub_grid_sampling=False,
      image_resolution_multiplier=irm, projection_depth_multiplier=1,
      max_bbox_pixels=window)
  fast, _ = gt.voxelize_batch(*args, **kwargs)
  general = jax.vmap(functools.partial(gt.voxelize_scene, **kwargs))(*args)
  tt.assert_array_equal(np.asarray(fast), np.asarray(general))


def test_blocked_multi_mesh_slots():
  m, irm, window = 32, 8, 24
  max_edge = (window - 4) / irm / m
  t1 = subdivide_triangles(cube_mesh(0.1, 0.42), max_edge)
  t2 = subdivide_triangles(cube_mesh(0.55, 0.9), max_edge)
  t = len(t1) + len(t2)
  tri = np.concatenate([t1, t2])[None].astype(np.float32)
  slot = np.concatenate([np.zeros(len(t1)), np.ones(len(t2))])[None]
  valid = np.ones((1, t), bool)
  labels = np.array([[3, 5]], np.int32)
  offs = np.full((1, 3), 0.5, np.float32)
  kwargs = dict(resolution=(m, m, m), image_resolution_multiplier=irm,
                conservative_rasterization=False, max_bbox_pixels=window)
  args = (jnp.asarray(tri), jnp.asarray(slot.astype(np.int32)),
          jnp.asarray(valid), jnp.asarray(labels), jnp.asarray(offs))
  fast, _ = gt.voxelize_batch(*args, **kwargs)
  general = jax.vmap(functools.partial(gt.voxelize_scene, **kwargs))(*args)
  tt.assert_array_equal(np.asarray(fast), np.asarray(general))
  got = set(np.unique(np.asarray(fast)).tolist())
  assert got == {0, 3, 5}, got


def test_blocked_random_triangles_match_general():
  """Random small triangles (satisfying the subdivision contract) across
  the whole grid, including the clamp-at-boundary paths."""
  m, irm, window = 32, 8, 24
  rng = np.random.default_rng(7)
  t = 128
  max_edge = (window - 4) / irm / m  # in view units
  base = rng.random((t, 1, 3)).astype(np.float32) * 1.06 - 0.03
  d1 = rng.normal(size=(t, 1, 3)).astype(np.float32)
  d2 = rng.normal(size=(t, 1, 3)).astype(np.float32)
  for d in (d1, d2):
    d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-6)
  scale = rng.random((t, 1, 1)).astype(np.float32) * max_edge
  tri = np.concatenate([base, base + d1 * scale, base + d2 * scale],
                       axis=1)[None]
  slot = np.zeros((1, t), np.int32)
  valid = rng.random((1, t)) < 0.9
  labels = np.ones((1, 1), np.int32)
  offs = np.array([[0.25, 0.5, 0.75]], np.float32)
  kwargs = dict(resolution=(m, m, m), image_resolution_multiplier=irm,
                conservative_rasterization=False, max_bbox_pixels=window,
                fill_inside=False)  # open triangles: compare the shells
  args = (jnp.asarray(tri), jnp.asarray(slot), jnp.asarray(valid),
          jnp.asarray(labels), jnp.asarray(offs))
  fast, _ = gt.voxelize_batch(*args, **kwargs)
  f, g = np.asarray(fast), np.asarray(
      jax.vmap(functools.partial(gt.voxelize_scene, **kwargs))(*args))
  # The fast path computes in-plane cells exactly from sample indices;
  # the general path reconstructs them barycentrically — on adversarial
  # random triangles a sample within fp-noise of a cell boundary may
  # land one voxel over (see raster_fast.py docstring). Allow only such
  # isolated surface-adjacent differences.
  diff = np.argwhere(f != g)
  occupied = max(int((g > 0).sum()), 1)
  assert len(diff) <= max(3, occupied // 1000), (len(diff), occupied)
  for idx in diff:
    b, z, y, x = idx
    z0, z1 = max(z - 1, 0), min(z + 2, g.shape[1])
    y0, y1 = max(y - 1, 0), min(y + 2, g.shape[2])
    x0, x1 = max(x - 1, 0), min(x + 2, g.shape[3])
    assert (g[b, z0:z1, y0:y1, x0:x1] > 0).any(), idx


def test_ineligible_configs_fall_back():
  # irm=2 violates the window/subdivision contract → general path.
  assert not raster_fast.blocked_eligible(
      resolution=(32, 32, 32), sub_grid_sampling=False,
      image_resolution_multiplier=2, projection_depth_multiplier=1,
      max_bbox_pixels=24)
  # sub-grid sampling → general path.
  assert not raster_fast.blocked_eligible(
      resolution=(32, 32, 32), sub_grid_sampling=True,
      image_resolution_multiplier=5, projection_depth_multiplier=1,
      max_bbox_pixels=24)
  # non-cubic → general path.
  assert not raster_fast.blocked_eligible(
      resolution=(64, 32, 32), sub_grid_sampling=False,
      image_resolution_multiplier=8, projection_depth_multiplier=1,
      max_bbox_pixels=24)
