"""Qualitative evaluation results: rendered reconstructions on disk + TB.

Parity with the reference QualitativeResults
(/root/reference/src/corenet/evaluation_results.py:54-182): for the first
K scenes of an eval, render [input image | predicted surface | predicted
voxel grid | GT voxel grid | GT meshes] under the default + tetrahedron
cameras and write `img_{scene_id}.png` under
<output>/<eval_name>/<step>/; the first few also go to the summary
writer. Each JAX process renders its own shard's scenes (no pickle-gather
over Gloo — renders land on disk per host; the summary writer on process
0 shows its local ones).
"""

from __future__ import annotations

import io
from typing import Sequence

import numpy as np

from corenet_tpu.utils import fs
from corenet_tpu.viz import artifacts as art
from corenet_tpu.viz import isosurface

try:
  import PIL.Image
  _HAVE_PIL = True
except ImportError:  # pragma: no cover
  _HAVE_PIL = False


def visualize_scene_output(input_image: np.ndarray,
                           pmf: np.ndarray,
                           gt_grid: np.ndarray,
                           meshes: Sequence[np.ndarray],
                           mesh_labels: Sequence[int],
                           grid_to_view: np.ndarray,
                           image_size=(256, 256),
                           max_surface_triangles: int = 30_000
                           ) -> np.ndarray:
  """One scene's qualitative tile (evaluation_results.py:54-117).

  The predicted surface renders as an extracted marching-tetrahedra mesh
  (the reference's MarchingCubesArtifact) unless it exceeds
  max_surface_triangles — a barely-trained model's near-noise PMF can
  yield millions of sliver triangles, where the O(pixels) raycast
  isosurface is the sane rendering — rasterization cost is O(T·H·W).
  The cap is checked with an O(voxels) active-cell pre-count so the
  near-noise case never pays for (or allocates) the full extraction."""
  pred_labels = np.argmax(pmf, axis=-1).astype(np.int32)
  pmf_f = np.asarray(pmf, np.float32)
  # Every active cell emits at least one triangle, so `cells > cap` is a
  # sound reason to skip extraction outright (the near-noise case this
  # guard exists for has millions of cells); anything under that bound
  # extracts — allocation is proportional to the actual (≤ ~6·cells)
  # count — and the exact post-check below still enforces the cap.
  est_cells = sum(
      isosurface.count_active_cells(isosurface.box_filter3d(pmf_f[..., c], 1))
      for c in range(1, pmf_f.shape[-1]))
  surface = None
  if est_cells <= max_surface_triangles:
    surface = art.MeshSurfaceArtifact(pmf, grid_to_world=grid_to_view)
    if sum(m.shape[0] for m in surface.meshes) > max_surface_triangles:
      surface = None
  if surface is None:
    surface = art.IsosurfaceArtifact(pmf, grid_to_world=grid_to_view)
  items = [
      art.ImageArtifact(input_image),
      surface,
      art.VoxelGridArtifact(pred_labels, grid_to_world=grid_to_view),
      art.VoxelGridArtifact(gt_grid, grid_to_world=grid_to_view),
      art.MultiMeshArtifact(meshes, mesh_labels),
  ]
  return art.visualize_artifacts(items, image_size)


class QualitativeResults:
  """Renders each host's shard to disk; the first-K tiles additionally go
  to the host-0 summary writer via a cross-host gather in
  `write_summaries` — the reference pickle-gathers its first-K rendered
  scenes to rank 0's TensorBoard (evaluation_results.py:166-182); here
  the gather is a fixed-shape `process_allgather` of the uint8 tiles
  (the tile shape is deterministic: (1+4 cameras)·H rows x 5 artifacts·W
  columns), so host 0's TB shows scenes owned by every host, not just
  its own shard."""

  def __init__(self, output_dir: str, num_results: int,
               num_results_in_summary: int = 4, summary_writer=None,
               image_size=(256, 256)):
    self.output_dir = output_dir
    self.num_results = num_results
    self.num_results_in_summary = num_results_in_summary
    self.summary_writer = summary_writer
    self.image_size = image_size
    self.rendered = 0
    self._summary_tiles = []

  def want_more(self) -> bool:
    return self.rendered < self.num_results

  def add_scene(self, scene_id: str, input_image, pmf, gt_grid, meshes,
                mesh_labels, grid_to_view, global_step: int = 0):
    if not self.want_more():
      return
    tile = visualize_scene_output(
        np.asarray(input_image), np.asarray(pmf), np.asarray(gt_grid),
        meshes, mesh_labels, np.asarray(grid_to_view), self.image_size)
    safe_id = scene_id.replace("/", "_")
    path = fs.join(self.output_dir, f"img_{safe_id}.png")
    fs.makedirs(self.output_dir)
    if _HAVE_PIL:
      buf = io.BytesIO()
      PIL.Image.fromarray(tile).save(buf, format="PNG")
      fs.write_bytes(path, buf.getvalue())
    else:  # pragma: no cover
      np.save(path + ".npy", tile)
    if len(self._summary_tiles) < self.num_results_in_summary:
      self._summary_tiles.append(tile)
    self.rendered += 1

  def write_summaries(self, global_step: int = 0) -> None:
    """Writes the first-K tiles to the summary writer, gathering across
    hosts first. COLLECTIVE under multi-process JAX: every process must
    call it (with or without a writer) or the allgather deadlocks."""
    import jax
    tiles = self._summary_tiles
    self._summary_tiles = []
    k = self.num_results_in_summary
    if k <= 0:
      return
    if jax.process_count() > 1:
      from jax.experimental import multihost_utils
      h, w = self.image_size
      shape = (k, 5 * h, 5 * w, 3)  # visualize_artifacts layout
      buf = np.zeros(shape, np.uint8)
      for i, t in enumerate(tiles[:k]):
        assert t.shape == shape[1:], (t.shape, shape)
        buf[i] = t
      count = np.asarray([min(len(tiles), k)], np.int32)
      all_buf = np.asarray(multihost_utils.process_allgather(buf))
      all_count = np.asarray(multihost_utils.process_allgather(count))
      all_buf = all_buf.reshape((-1,) + shape)
      all_count = all_count.reshape(-1)
      tiles = [all_buf[p, i]
               for p in range(all_buf.shape[0])
               for i in range(int(all_count[p]))]
    if self.summary_writer is None:
      return
    for i, tile in enumerate(tiles[:k]):
      self.summary_writer.add_image(f"rec_{i}", tile, global_step)
