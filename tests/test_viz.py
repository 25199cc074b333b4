"""Software renderer + artifact framework tests (structural assertions in
place of the reference's golden-PNG L1 comparisons — same spec: right
shapes, right colors in the right places, background where nothing is)."""

import numpy as np
import numpy.testing as tt

from corenet_tpu.viz import artifacts as art
from corenet_tpu.viz import camera as camera_util
from corenet_tpu.viz import renderer
from corenet_tpu.viz.colors import DEFAULT_COLOR_PALETTE

from helpers import cube_mesh


def test_render_mesh_cube():
  tris = cube_mesh(0.2, 0.8)
  colors = np.tile(np.array([[0.9, 0.2, 0.1]], np.float32), (12, 1))
  cam = camera_util.default_camera([0, 0, 0], [1, 1, 1])
  img = renderer.render_mesh(tris, colors, cam, (96, 96))
  assert img.shape == (96, 96, 3) and img.dtype == np.uint8
  # Cube visible in the center, red-dominant; background at corners.
  c = img[48, 48]
  assert c[0] > 100 and c[0] > 2 * max(c[1], 1)
  tt.assert_array_equal(img[1, 1], [255, 255, 255])
  tt.assert_array_equal(img[94, 94], [255, 255, 255])
  # Faces with different normals shade differently (3D look).
  assert len(np.unique(img.reshape(-1, 3), axis=0)) >= 3


def test_render_mesh_depth_order():
  # A red cube in front of (closer to camera than) a green cube.
  front = cube_mesh(0.3, 0.7)
  back = cube_mesh(0.3, 0.7) + np.array([0, 0, -3], np.float32)
  tris = np.concatenate([back, front])
  colors = np.concatenate([
      np.tile(np.array([[0.0, 0.9, 0.0]], np.float32), (12, 1)),
      np.tile(np.array([[0.9, 0.0, 0.0]], np.float32), (12, 1)),
  ])
  # Camera on +z looking down -z: front cube occludes back cube.
  cam = camera_util._framing([0.3, 0.3, 0.3], [0.7, 0.7, 0.7],
                             np.array([0., 0., 1.], np.float32))
  img = renderer.render_mesh(tris, colors, cam, (64, 64))
  center = img[32, 32]
  assert center[0] > center[1], f"front cube should win: {center}"


def test_render_voxel_grid_labels_and_palette():
  grid = np.zeros((8, 8, 8), np.int32)
  grid[2:6, 2:6, 2:6] = 1
  img = renderer.render_voxel_grid(grid, image_size=(64, 64))
  assert img.shape == (64, 64, 3)
  center = img[32, 32]
  # Label 1 → palette red.
  assert center[0] > center[1] and center[0] > center[2]
  tt.assert_array_equal(img[1, 1], [255, 255, 255])

  # Empty grid → all background.
  img = renderer.render_voxel_grid(np.zeros((4, 4, 4), np.int32),
                                   image_size=(32, 32))
  tt.assert_array_equal(img, np.full((32, 32, 3), 255, np.uint8))


def test_visualize_artifacts_layout():
  grid = np.zeros((8, 8, 8), np.int32)
  grid[3:5, 3:5, 3:5] = 2
  g2w = np.eye(4, dtype=np.float32)
  g2w[:3, :3] /= 8.0
  items = [
      art.ImageArtifact(np.full((10, 20, 3), 128, np.uint8)),
      art.MultiMeshArtifact([cube_mesh(0.3, 0.7)], [1]),
      art.VoxelGridArtifact(grid, g2w),
  ]
  tile = art.visualize_artifacts(items, image_size=(48, 48))
  assert tile.shape == (5 * 48, 3 * 48, 3)  # 5 cameras × 3 artifacts

  # The image artifact repeats identically across camera rows.
  tt.assert_array_equal(tile[:48, :48], tile[48:96, :48])


def test_isosurface_artifact():
  pmf = np.zeros((8, 8, 8, 3), np.float32)
  pmf[..., 0] = 1.0
  pmf[2:6, 2:6, 2:6, 0] = 0.1
  pmf[2:6, 2:6, 2:6, 2] = 0.9  # class 2 foreground blob
  a = art.IsosurfaceArtifact(pmf)
  assert a.grid[4, 4, 4] == 2 and a.grid[0, 0, 0] == 0
  img = a.render(camera_util.default_camera(*a.get_3d_box()), (48, 48))
  assert (img != 255).any()


def test_mesh_surface_artifact():
  """Marching-tetrahedra surface artifact (the reference's
  MarchingCubesArtifact role): extracts one mesh per class, colored and
  renderable."""
  pmf = np.zeros((8, 8, 8, 3), np.float32)
  pmf[..., 0] = 1.0
  pmf[2:6, 2:6, 2:6, 0] = 0.1
  pmf[2:6, 2:6, 2:6, 2] = 0.9  # class 2 foreground blob
  a = art.MeshSurfaceArtifact(pmf)
  assert len(a.meshes) == 1 and a.mesh_labels == [2]
  assert a.meshes[0].shape[0] > 10
  # The extracted surface sits around the blob (voxel centers 2.5-5.5).
  lo, hi = a.get_3d_box()
  assert np.all(lo > 1.0) and np.all(hi < 7.0)
  img = a.render(camera_util.default_camera(lo, hi), (48, 48))
  assert (img != 255).any()
  # With a transform the surface follows it.
  g2w = np.eye(4, dtype=np.float32)
  g2w[:3, :3] /= 8.0
  b = art.MeshSurfaceArtifact(pmf, grid_to_world=g2w)
  lo_b, hi_b = b.get_3d_box()
  tt.assert_allclose(lo_b, lo / 8.0, rtol=1e-5)
  tt.assert_allclose(hi_b, hi / 8.0, rtol=1e-5)


def test_qualitative_scene_tile(tmp_path):
  from corenet_tpu.eval.qualitative import QualitativeResults
  pmf = np.zeros((8, 8, 8, 2), np.float32)
  pmf[..., 0] = 1.0
  pmf[3:5, 3:5, 3:5] = [0.2, 0.8]
  gt = np.zeros((8, 8, 8), np.int32)
  gt[3:5, 3:5, 3:5] = 1
  g2v = np.eye(4, dtype=np.float32)
  g2v[:3, :3] /= 8.0
  q = QualitativeResults(str(tmp_path), num_results=1)
  q.add_scene("scenes/s1", np.zeros((16, 16, 3), np.uint8), pmf, gt,
              [cube_mesh(0.4, 0.6)], [1], g2v)
  q.add_scene("scenes/s2", np.zeros((16, 16, 3), np.uint8), pmf, gt,
              [cube_mesh(0.4, 0.6)], [1], g2v)  # beyond num_results
  import os
  files = sorted(os.listdir(tmp_path))
  assert files == ["img_scenes_s1.png"]


def _l1(a, b):
  return float(np.abs(a.astype(np.int32) - b.astype(np.int32)).mean())


def test_mesh_render_matches_golden():
  """Golden-image regression with an L1 budget (the reference's
  scene_renderer_test scheme, against our own committed goldens)."""
  import os
  import PIL.Image
  golden_dir = os.path.join(os.path.dirname(__file__), "golden")
  tris = cube_mesh(0.25, 0.75)
  colors = np.tile(np.array([[0.894, 0.102, 0.110]], np.float32), (12, 1))
  cam = camera_util.default_camera([0, 0, 0], [1, 1, 1])
  img = renderer.render_mesh(tris, colors, cam, (128, 128))
  golden = np.asarray(PIL.Image.open(
      os.path.join(golden_dir, "expected_image_mesh.png")))
  assert _l1(img, golden) < 1.0


def test_voxel_render_matches_golden():
  import os
  import PIL.Image
  golden_dir = os.path.join(os.path.dirname(__file__), "golden")
  grid = np.zeros((16, 16, 16), np.int32)
  grid[4:12, 4:12, 4:12] = 1
  grid[6:10, 6:10, 11:16] = 2
  img = renderer.render_voxel_grid(grid, image_size=(128, 128))
  golden = np.asarray(PIL.Image.open(
      os.path.join(golden_dir, "expected_image_voxels.png")))
  assert _l1(img, golden) < 1.0


def _png(img: np.ndarray) -> bytes:
  import io
  import PIL.Image
  buf = io.BytesIO()
  PIL.Image.fromarray(img).save(buf, format="PNG")
  return buf.getvalue()


def test_load_textures_dedup_and_flip():
  """Contract of the reference's load_textures
  (scene_renderer.py:34-82): dedup identical byte strings, empty → -1,
  resize to texture_size, Y flip."""
  from corenet_tpu.viz.scene_renderer import load_textures
  a = np.zeros((4, 4, 3), np.uint8)
  a[0] = [255, 0, 0]  # top row red
  b = np.full((8, 8, 3), 64, np.uint8)
  pa, pb = _png(a), _png(b)
  tex, idx = load_textures([pa, b"", pb, pa], texture_size=(4, 4))
  tt.assert_array_equal(idx, [0, -1, 1, 0])
  assert tex.shape == (2, 4, 4, 3)
  # Y flip: the red top row of `a` lands at the bottom of layer 0.
  assert tex[0, 3, 0, 0] > 200 and tex[0, 0, 0, 0] < 50
  assert np.all(tex[1] == 64)


def test_render_mesh_texture_sampling():
  """A screen-filling quad textured left-red/right-green samples the
  texture (bilinear, perspective-correct); untextured triangles keep
  their color."""
  tex = np.zeros((1, 8, 8, 3), np.uint8)
  tex[:, :, :4, 0] = 255  # left half red
  tex[:, :, 4:, 1] = 255  # right half green
  v = {"bl": [-1, -1, 0], "br": [1, -1, 0], "tr": [1, 1, 0], "tl": [-1, 1, 0]}
  uv = {"bl": [0, 0], "br": [1, 0], "tr": [1, 1], "tl": [0, 1]}
  tris = np.array([[v["bl"], v["br"], v["tr"]],
                   [v["bl"], v["tr"], v["tl"]]], np.float32)
  uvs = np.array([[uv["bl"], uv["br"], uv["tr"]],
                  [uv["bl"], uv["tr"], uv["tl"]]], np.float32)
  cam = np.eye(4, dtype=np.float32)  # world == clip; lum == 1
  img = renderer.render_mesh(
      tris, np.full((2, 3), 0.5, np.float32), cam, (32, 32),
      tri_uvs=uvs, tri_tex=np.zeros((2,), np.int32), textures=tex)
  assert img[16, 4, 0] > 200 and img[16, 4, 1] < 50   # left: red
  assert img[16, 28, 1] > 200 and img[16, 28, 0] < 50  # right: green

  # tri_tex = -1 → flat color path.
  img2 = renderer.render_mesh(
      tris, np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (2, 1)),
      cam, (32, 32), tri_uvs=uvs, tri_tex=np.full((2,), -1, np.int32),
      textures=tex)
  assert img2[16, 4, 2] > 200 and img2[16, 28, 2] > 200


def test_render_scene_samples_textures(tmp_path):
  """A scene whose mesh carries texcoords + a diffuse texture renders
  with sampled texture colors."""
  from corenet_tpu.data import scene as scene_lib
  from corenet_tpu.viz.scene_renderer import render_scene

  quad = np.array([[[0, 0, 0.5], [1, 0, 0.5], [1, 1, 0.5]],
                   [[0, 0, 0.5], [1, 1, 0.5], [0, 1, 0.5]]], np.float32)
  uvs = np.array([[[0, 0], [1, 0], [1, 1]],
                  [[0, 0], [1, 1], [0, 1]]], np.float32)
  solid = np.full((8, 8, 3), 0, np.uint8)
  solid[..., 0] = 255  # red texture
  sc = scene_lib.Scene(
      mesh_vertices=[quad],
      view_transform=np.eye(4, dtype=np.float32),
      o2w_transforms=np.eye(4, dtype=np.float32)[None],
      camera_transform=np.array([[2, 0, 0, -1], [0, 2, 0, -1],
                                 [0, 0, 2, -1], [0, 0, 0, 1]], np.float32),
      mesh_labels=["x"],
      mesh_visible_fractions=np.ones([1], np.float32),
      opengl_image=np.zeros((4, 4, 3), np.uint8),
      pbrt_image=np.zeros((4, 4, 3), np.uint8),
      texcoords=[uvs],
      material_ids=[np.zeros((2,), np.int32)],
      diffuse_colors=[np.array([[0, 0, 1]], np.float32)],  # blue fallback
      diffuse_texture_pngs=[[_png(solid)]])
  img = render_scene(sc, image_size=(32, 32))
  mid = img[16, 16]
  assert mid[0] > 150 and mid[2] < 80, mid  # textured red, not blue


def test_render_scene_with_materials(tmp_path):
  from corenet_tpu.data import scene as scene_lib
  from corenet_tpu.viz.scene_renderer import render_scene
  from helpers import make_fixture_dataset
  manifest, meshes_dir = make_fixture_dataset(str(tmp_path), num_scenes=1)
  import os, json
  files = json.load(open(manifest))["files"]
  sc = scene_lib.load_from_npz(
      os.path.join(os.path.dirname(manifest), files[0]), meshes_dir)
  img = render_scene(sc, image_size=(64, 64))
  assert img.shape == (64, 64, 3)
  assert (img != 255).any()  # something rendered


def test_qualitative_summary_tiles_deferred(tmp_path):
  """TB tiles are written by write_summaries (the cross-host gather
  point), not during add_scene; capped at num_results_in_summary."""
  from corenet_tpu.eval.qualitative import QualitativeResults

  class RecordingWriter:
    def __init__(self):
      self.images = []

    def add_image(self, tag, img, step):
      self.images.append((tag, np.asarray(img).shape, step))

  pmf = np.zeros((8, 8, 8, 2), np.float32)
  pmf[..., 0] = 1.0
  pmf[3:5, 3:5, 3:5] = [0.2, 0.8]
  gt = np.zeros((8, 8, 8), np.int32)
  gt[3:5, 3:5, 3:5] = 1
  g2v = np.eye(4, dtype=np.float32)
  g2v[:3, :3] /= 8.0
  writer = RecordingWriter()
  q = QualitativeResults(str(tmp_path), num_results=2,
                         num_results_in_summary=1, summary_writer=writer,
                         image_size=(32, 32))
  for sid in ("s1", "s2"):
    q.add_scene(sid, np.zeros((16, 16, 3), np.uint8), pmf, gt,
                [cube_mesh(0.4, 0.6)], [1], g2v, global_step=7)
  assert writer.images == []  # deferred until the collective point
  q.write_summaries(7)
  assert [t for t, _, _ in writer.images] == ["rec_0"]
  tag, shape, step = writer.images[0]
  assert step == 7 and shape == (5 * 32, 5 * 32, 3)
