"""Marching-tetrahedra isosurface extraction (viz/isosurface.py) — the
mesh-extraction role of the reference's MarchingCubesArtifact
(artifacts.py:199-289)."""

import numpy as np

from corenet_tpu.viz import isosurface


def _sphere_volume(n=24, radius=8.0):
  z, y, x = np.mgrid[:n, :n, :n].astype(np.float32)
  c = (n - 1) / 2.0
  r = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2)
  return (r < radius).astype(np.float32), c, radius


def test_sphere_surface_properties():
  vol, c, radius = _sphere_volume()
  tris = isosurface.marching_tetrahedra(vol, level=0.5)
  assert tris.shape[0] > 100 and tris.shape[1:] == (3, 3)
  # Every vertex lies within half a voxel of the sphere surface.
  verts = tris.reshape(-1, 3)
  r = np.linalg.norm(verts - c, axis=-1)
  assert np.all(np.abs(r - radius) < 1.0), (r.min(), r.max())
  # Surface area ≈ 4πr² (a voxelized sphere's triangulated surface runs
  # ~1.2-1.5x the smooth area; it must be in that ballpark, not 6r² like
  # a bounding box).
  e1 = tris[:, 1] - tris[:, 0]
  e2 = tris[:, 2] - tris[:, 0]
  area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1).sum()
  smooth = 4 * np.pi * radius ** 2
  assert smooth * 0.9 < area < smooth * 1.8, (area, smooth)


def test_watertight_closed_surface():
  """Each undirected edge of the extracted surface is shared by exactly
  two triangles (the marching-tetrahedra watertightness guarantee)."""
  vol, _, _ = _sphere_volume(n=12, radius=4.0)
  tris = isosurface.marching_tetrahedra(vol, level=0.5)
  # Quantize vertices so shared edge endpoints hash identically.
  q = np.round(tris * 4096).astype(np.int64)
  vert_ids = {}
  tri_ids = np.empty((q.shape[0], 3), np.int64)
  for i, tri in enumerate(q):
    for j in range(3):
      key = tuple(tri[j])
      tri_ids[i, j] = vert_ids.setdefault(key, len(vert_ids))
  # Drop degenerate triangles (two corners collapse onto the same lattice
  # interpolation point — zero area, no effect on the manifold).
  degen = ((tri_ids[:, 0] == tri_ids[:, 1]) |
           (tri_ids[:, 1] == tri_ids[:, 2]) |
           (tri_ids[:, 0] == tri_ids[:, 2]))
  counts = {}
  for tri in tri_ids[~degen]:
    for a, b in ((0, 1), (1, 2), (2, 0)):
      e = (min(tri[a], tri[b]), max(tri[a], tri[b]))
      counts[e] = counts.get(e, 0) + 1
  bad = {e: c for e, c in counts.items() if c != 2}
  assert not bad, f"{len(bad)} non-manifold edges of {len(counts)}"


def test_boundary_above_level_closed_by_padding():
  """A volume that is 'above' at the array boundary still yields a closed
  box surface (the reference pads with zeros, artifacts.py:270)."""
  vol = np.ones((4, 4, 4), np.float32)
  tris = isosurface.marching_tetrahedra(vol, level=0.5, pad=True)
  assert tris.shape[0] > 0
  verts = tris.reshape(-1, 3)
  # Surface sits between the outermost lattice points and the padding.
  assert verts.min() >= -1.0 and verts.max() <= 4.0
  e1 = tris[:, 1] - tris[:, 0]
  e2 = tris[:, 2] - tris[:, 0]
  area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1).sum()
  # A cube of side ~3.5 has surface ~6*3.5² = 73.5 (tet-triangulated
  # surfaces of axis-aligned boxes are exact).
  assert 50 < area < 110, area


def test_empty_and_full_volumes():
  assert isosurface.marching_tetrahedra(
      np.zeros((5, 5, 5), np.float32)).shape == (0, 3, 3)
  assert isosurface.marching_tetrahedra(
      np.ones((5, 5, 5), np.float32), pad=False).shape == (0, 3, 3)


def test_vertex_coordinate_convention():
  """A single above-level lattice point at (z=1, y=2, x=3) produces a
  small surface centered on (x, y, z) = (3, 2, 1)."""
  vol = np.zeros((4, 4, 5), np.float32)
  vol[1, 2, 3] = 1.0
  tris = isosurface.marching_tetrahedra(vol, level=0.5)
  assert tris.shape[0] > 0
  center = tris.reshape(-1, 3).mean(0)
  np.testing.assert_allclose(center, [3, 2, 1], atol=0.2)


def test_box_filter3d_matches_direct_convolution():
  rng = np.random.default_rng(0)
  vol = rng.random((6, 7, 8)).astype(np.float32)
  k = 3
  got = isosurface.box_filter3d(vol, k)
  lo = (k - 1) // 2
  hi = k - 1 - lo
  padded = np.pad(vol, ((lo, hi),) * 3)
  want = np.zeros_like(vol)
  for dz in range(k):
    for dy in range(k):
      for dx in range(k):
        want += padded[dz:dz + 6, dy:dy + 7, dx:dx + 8]
  want /= k ** 3
  np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_box_filter_smooths_before_extraction():
  vol, c, radius = _sphere_volume()
  smooth = isosurface.box_filter3d(vol, 3)
  tris = isosurface.marching_tetrahedra(smooth, level=0.5)
  verts = tris.reshape(-1, 3)
  r = np.linalg.norm(verts - c, axis=-1)
  assert np.all(np.abs(r - radius) < 1.5)


def test_extract_class_meshes_from_labels():
  grid = np.zeros((8, 8, 8), np.int32)
  grid[1:4, 1:4, 1:4] = 1
  grid[4:7, 4:7, 4:7] = 2
  m1, m2 = isosurface.extract_class_meshes(grid, num_classes=3)
  assert m1.shape[0] > 0 and m2.shape[0] > 0
  c1 = m1.reshape(-1, 3).mean(0)
  c2 = m2.reshape(-1, 3).mean(0)
  np.testing.assert_allclose(c1, [2, 2, 2], atol=0.3)
  np.testing.assert_allclose(c2, [5, 5, 5], atol=0.3)
