"""Evaluation pipeline: dataset → GT voxelize → inference → metrics → CSV.

Mirrors the reference EvalPipeline
(/root/reference/src/corenet/pipeline.py:279-343): a pluggable
`inference_fn(image, camera, v2x, grid_offsets, output_resolution) → PMF`
runs over a (optionally per-step reshuffled) eval dataset; GT grids are
voxelized at the eval resolution; a confusion matrix accumulates and
rank 0 writes `voxel_metrics.csv` + scalar summaries; returns mean IoU.

TPU-native shape: GT voxelization runs on-device inside a jitted
function; batches are padded to the configured batch size (with a
validity mask instead of the reference's drop-last/pad-rank dance); each
JAX process evaluates a contiguous shard of the dataset and the final
confusion matrix reduces across hosts.
"""

from __future__ import annotations

import functools
import logging
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from corenet_tpu.config import config as cfg
from corenet_tpu.data.loader import DataLoader
from corenet_tpu.data.manager import DatasetManager
from corenet_tpu.eval.results import QuantitativeResults
from corenet_tpu.train import gt as gt_lib
from corenet_tpu.utils import fs

log = logging.getLogger(__name__)

# InferenceFn: (image u8[B,H,W,3], camera f32[B,4,4], v2x f32[B,4,4],
#   grid_offsets f32[B,3], output_resolution (d,h,w)) → pmf [B,D,H,W,C]
InferenceFn = Callable

VOXELIZE_WINDOW_PIXELS = 24  # with triangle subdivision below


def shard_range(n: int, num_shards: int, shard: int) -> Tuple[int, int]:
  """Contiguous per-process shard (no padding — eval must not duplicate)."""
  per = (n + num_shards - 1) // num_shards
  lo = min(shard * per, n)
  return lo, min(lo + per, n)


class EvalPipeline:

  def __init__(self,
               eval_config: cfg.EvalConfig,
               output_dir: str,
               inference_fn: InferenceFn,
               write_results: bool = True,
               write_qualitative: bool = True,
               summary_writer=None):
    self.config = eval_config
    self.output_dir = output_dir
    self.inference_fn = inference_fn
    self.write_results = write_results
    self.write_qualitative = write_qualitative
    self.summary_writer = summary_writer
    self.dataset_manager = DatasetManager(eval_config.data)
    self.classes = self.dataset_manager.classes
    # One jitted GT program reused across eval runs (compiles once).
    self._cached_gt_fn = self._gt_fn(
        eval_config.data.voxelization_config,
        eval_config.data.data_loader.batch_size)

  def _gt_fn(self, vc: cfg.VoxelizationConfig, batch_size: int):
    resolution = vc.resolution.as_tuple()
    return jax.jit(functools.partial(
        gt_lib.voxelize_batch,
        resolution=resolution,
        sub_grid_sampling=vc.sub_grid_sampling,
        image_resolution_multiplier=vc.voxelization_image_resolution_multiplier,
        conservative_rasterization=vc.conservative_rasterization,
        projection_depth_multiplier=vc.voxelization_projection_depth_multiplier,
        max_bbox_pixels=VOXELIZE_WINDOW_PIXELS,
        num_label_values=len(self.classes),
    ))

  def run_eval(self, global_step: int,
               max_scenes: Optional[int] = None) -> Optional[float]:
    vc = self.config.data.voxelization_config
    task_type = vc.task_type.value
    resolution = vc.resolution.as_tuple()
    batch_size = self.config.data.data_loader.batch_size

    dataset = self.dataset_manager.create_dataset(local_seed=global_step)
    if max_scenes is not None:
      dataset = dataset[:max_scenes]
    lo, hi = shard_range(len(dataset), jax.process_count(),
                         jax.process_index())
    shard = dataset[lo:hi]
    log.info("Eval '%s' @ step %d: %d scenes (shard %d-%d of %d)",
             self.config.name, global_step, len(shard), lo, hi, len(dataset))

    quantitative = QuantitativeResults(self.classes, task_type)
    qualitative = None
    if self.write_qualitative and self.config.num_qualitative_results > 0:
      from corenet_tpu.eval.qualitative import QualitativeResults
      out_dir = fs.join(self.output_dir, self.config.name, str(global_step))
      qualitative = QualitativeResults(
          out_dir, self.config.num_qualitative_results,
          self.config.num_qualitative_results_in_tensor_board,
          self.summary_writer)
    gt_fn = self._cached_gt_fn
    # Subdivide so every triangle fits the voxelizer's sampling window.
    m = max(resolution)
    irm = vc.voxelization_image_resolution_multiplier
    max_edge_view = (VOXELIZE_WINDOW_PIXELS - 4) / irm / m

    dl_cfg = self.config.data.data_loader
    loader = DataLoader(
        shard, batch_size=batch_size,
        num_workers=dl_cfg.num_data_workers,
        prefetch_factor=dl_cfg.prefetch_factor,
        max_edge_view=max_edge_view,
        worker_processes=None if dl_cfg.worker_processes else False)
    # Eval is a PER-HOST program (each process runs its own dataset shard,
    # with its own number of batches, on host-local arrays) — so any trace
    # triggered inside this loop (the GT program, the inference forward)
    # must not pick up a multi-host train mesh from the kernel registry:
    # shard_map over non-addressable devices errors, and even a valid
    # global program would deadlock once hosts' batch counts diverge.
    # Scope the registry to a mesh that is safe for host-local execution
    # (the registered mesh when fully addressable, else the local chips).
    from corenet_tpu.parallel import kernel_sharding
    with kernel_sharding.scoped_mesh(
        kernel_sharding.mesh_for_host_local_programs()):
      self._run_batches(loader, gt_fn, task_type, resolution, batch_size,
                        quantitative, qualitative, global_step)

    if qualitative is not None:
      # Collective: every host participates in gathering the first-K
      # tiles to host 0's TensorBoard (evaluation_results.py:166-182).
      qualitative.write_summaries(global_step)
    df = quantitative.compute_metrics()
    if jax.process_index() == 0 and self.write_results:
      out_dir = fs.join(self.output_dir, self.config.name, str(global_step))
      quantitative.write_csv(fs.join(out_dir, "voxel_metrics.csv"))
      log.info("Eval '%s' mIoU=%.4f", self.config.name,
               quantitative.get_mean_iou())
    if jax.process_index() == 0 and self.summary_writer is not None:
      # Per-class IoU/Precision/Recall + General/* scalars, the
      # reference's per-eval tensorboard stream
      # (evaluation_results.py:213-238).
      for name, value in quantitative.scalar_summaries().items():
        self.summary_writer.add_scalar(name, value, global_step)
      self.summary_writer.flush()
    return quantitative.get_mean_iou() if df is not None else None

  def _run_batches(self, loader, gt_fn, task_type, resolution, batch_size,
                   quantitative, qualitative, global_step):
    # Rank-0 operator view of every worker's eval progress (heartbeat
    # files; the reference's ui.py RPC funnel equivalent).
    progress = None
    if jax.process_count() > 1:
      from corenet_tpu.utils.ui import WorkerProgress
      progress = WorkerProgress(
          fs.join(self.output_dir, self.config.name, str(global_step)),
          desc=f"eval:{self.config.name}", interval_sec=30.0)
    n_batches = len(loader) if hasattr(loader, "__len__") else None
    for bi, (hb, valid) in enumerate(loader):
      inputs = hb.step_inputs(task_type)
      grid, v2x = gt_fn(inputs["triangles"], inputs["tri_mesh_slot"],
                        inputs["tri_valid"], inputs["mesh_labels"],
                        inputs["grid_offset"])
      pmf = self.inference_fn(jnp.asarray(hb.image), jnp.asarray(hb.camera),
                              v2x, jnp.asarray(hb.grid_offset), resolution)
      fg_labels = hb.mesh_labels[:, 0]
      quantitative.add_batch(pmf, grid, fg_labels, valid)
      if progress is not None:
        progress.report(bi + 1, n_batches)

      if qualitative is not None and qualitative.want_more():
        pmf_np = np.asarray(jax.device_get(pmf))
        grid_np = np.asarray(jax.device_get(grid))
        m = float(max(resolution))
        for i in range(batch_size):
          if not valid[i] or not qualitative.want_more():
            continue
          off = hb.grid_offset[i]
          w2x = np.eye(4, dtype=np.float32)
          w2x[:3, :3] *= m
          w2x[:3, 3] = off - 0.5
          meshes = [
              hb.triangles[i][hb.tri_valid[i] & (hb.tri_mesh_slot[i] == j)]
              for j in range(int(hb.mesh_valid[i].sum()))
          ]
          qualitative.add_scene(
              hb.scene_ids[i], hb.image[i], pmf_np[i], grid_np[i], meshes,
              list(hb.mesh_labels[i]), np.linalg.inv(w2x), global_step)
