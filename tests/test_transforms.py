"""Golden-value tests for the transform algebra.

The analytic inputs and expected matrices replicate the behavioral spec
established by the reference's transformations_test.py and camera_test.py,
so matrix-layout parity is pinned down (row-major, column-vector action).
"""

import math

import numpy as np
import numpy.testing as tt

from corenet_tpu import geom


def test_scale():
  tt.assert_array_equal(
      np.asarray(geom.scale((1, 2, 3))),
      np.array([
          [1, 0, 0, 0],
          [0, 2, 0, 0],
          [0, 0, 3, 0],
          [0, 0, 0, 1],
      ], np.float32))


def test_translate():
  tt.assert_array_equal(
      np.asarray(geom.translate((1, 2, 3))),
      np.array([
          [1, 0, 0, 1],
          [0, 1, 0, 2],
          [0, 0, 1, 3],
          [0, 0, 0, 1],
      ], np.float32))
  tt.assert_array_equal(
      np.asarray(geom.translate([[[1, 2, 3], [4, 5, 6]]])),
      np.array([[[
          [1, 0, 0, 1],
          [0, 1, 0, 2],
          [0, 0, 1, 3],
          [0, 0, 0, 1],
      ], [
          [1, 0, 0, 4],
          [0, 1, 0, 5],
          [0, 0, 1, 6],
          [0, 0, 0, 1],
      ]]], np.float32))


def test_rotate():
  tt.assert_allclose(
      np.asarray(geom.rotate(math.pi / 2, (0, 0, 1))),
      np.array([
          [0, -1, 0, 0],
          [1, 0, 0, 0],
          [0, 0, 1, 0],
          [0, 0, 0, 1],
      ], np.float32),
      rtol=1e-5, atol=1e-5)


def test_transform_points_homogeneous():
  transform_1 = (
      (1, 0, 0, 0),
      (0, 2, 0, 0),
      (0, 0, 3, 0),
      (0, 0, 0, 1),
  )
  transform_2 = (
      (1, 0, 0, 1),
      (0, 1, 0, 2),
      (0, 0, 1, 3),
      (0, 0, 0, 1),
  )
  points_1 = ((12, 34, 56), (34, 32, 30), (11, 11, 18), (5, 6, 7))
  points_2 = ((1, 2, 3), (4, 5, 6), (6, 5, 4), (3, 2, 1))
  expected = np.array([
      [[12, 68, 168], [34, 64, 90], [11, 22, 54], [5, 12, 21]],
      [[2, 4, 6], [5, 7, 9], [7, 7, 7], [4, 4, 4]],
  ], np.float32)

  out = geom.transform_points_homogeneous(
      (points_1, points_2), (transform_1, transform_2), w=1)
  out = np.asarray(out[..., :3] / out[..., 3:4])
  tt.assert_array_equal(out, expected)


def test_transform_points_perspective_division():
  m = np.array([
      [1, 0, 0, 0],
      [0, 1, 0, 0],
      [0, 0, 1, 0],
      [0, 0, 0, 2],
  ], np.float32)
  out = np.asarray(geom.transform_points([[2, 4, 6]], m))
  tt.assert_allclose(out, [[1, 2, 3]])


def test_transform_mesh():
  transform = (
      (1, 0, 0, 0),
      (0, 2, 0, 0),
      (0, 0, 3, 0),
      (0, 0, 0, 1),
  )
  mesh = (
      ((12, 34, 56), (34, 32, 30), (11, 11, 18)),
      ((1, 2, 3), (4, 5, 6), (6, 5, 4)),
  )
  expected = np.array([
      [[12, 68, 168], [34, 64, 90], [11, 22, 54]],
      [[1, 4, 9], [4, 10, 18], [6, 10, 12]],
  ], np.float32)
  tt.assert_array_equal(np.asarray(geom.transform_mesh(mesh, transform)),
                        expected)


def test_chain_composition_order():
  s = geom.scale([2, 2, 2])
  t = geom.translate([1, 0, 0])
  # chain([t, s]) applies s first: p -> t(s(p))
  m = geom.chain([t, s])
  out = np.asarray(geom.transform_points([[1, 1, 1]], m))
  tt.assert_allclose(out, [[3, 2, 2]])


def test_ortho_lh():
  # ortho_lh(0, w, h, 0, 0, d) maps voxel x∈[0,w] → [-1,1],
  # y∈[0,h] → [1,-1] (y axis flipped), z∈[0,d] → [-1,1].
  m = geom.ortho_lh(0, 4, 4, 0, 0, 8)
  out = np.asarray(geom.transform_points([[0, 0, 0], [4, 4, 8], [2, 2, 4]], m))
  tt.assert_allclose(out, [[-1, 1, -1], [1, -1, 1], [0, 0, 0]], atol=1e-6)


def test_look_at_and_perspective_shapes_and_props():
  cam = geom.look_at_rh([0, 0, 5], [0, 0, 0], [0, 1, 0])
  # Eye maps to origin.
  out = np.asarray(geom.transform_points([[0, 0, 5]], cam))
  tt.assert_allclose(out, [[0, 0, 0]], atol=1e-6)
  # A point in front of the camera has negative z in RH view space.
  out = np.asarray(geom.transform_points([[0, 0, 0]], cam))
  assert out[0, 2] < 0

  cam = geom.look_at_lh([0, 0, -5], [0, 0, 0], [0, 1, 0])
  out = np.asarray(geom.transform_points([[0, 0, 0]], cam))
  assert out[0, 2] > 0

  p = np.asarray(geom.perspective_rh(math.pi / 2, 1.0, 0.1, 100.0))
  assert p.shape == (4, 4) and p[3, 2] == -1


def test_matches_torch_reference_formulas():
  """Cross-checks rotate/look_at against an independent torch recomputation."""
  torch = __import__("torch")

  def torch_rotate(angle, axis):
    axis = torch.nn.functional.normalize(
        torch.tensor(axis, dtype=torch.float32), dim=-1)
    angle = torch.tensor(angle, dtype=torch.float32)
    sin_axis = torch.sin(angle) * axis
    cos_angle = torch.cos(angle)
    cos1_axis = (1.0 - cos_angle) * axis
    x, y, z = axis
    m = torch.eye(4)
    m[0, 0] = cos1_axis[0] * x + cos_angle
    m[1, 1] = cos1_axis[1] * y + cos_angle
    m[2, 2] = cos1_axis[2] * z + cos_angle
    m[0, 1] = cos1_axis[0] * y - sin_axis[2]
    m[1, 0] = cos1_axis[0] * y + sin_axis[2]
    m[0, 2] = cos1_axis[0] * z + sin_axis[1]
    m[2, 0] = cos1_axis[0] * z - sin_axis[1]
    m[1, 2] = cos1_axis[1] * z - sin_axis[0]
    m[2, 1] = cos1_axis[1] * z + sin_axis[0]
    return m.numpy()

  for angle, axis in [(0.3, (1., 2., 3.)), (-1.2, (0., 1., 0.)),
                      (2.7, (-1., 0.5, 2.))]:
    tt.assert_allclose(
        np.asarray(geom.rotate(angle, axis)), torch_rotate(angle, axis),
        rtol=1e-5, atol=1e-6)
