"""Evaluation results aggregation: confusion accumulation → metrics
DataFrame → CSV / scalar summaries.

Output parity with the reference (/root/reference/src/corenet/
evaluation_results.py:185-279): the `voxel_metrics.csv` DataFrame has rows
(iou, precision, recall) and columns (class names..., `__global__`), where
`__global__` holds class-agnostic FG/BG metrics; mean IoU averages the
per-class IoUs excluding `__void__` and `__global__`, skipping NaN
(absent) classes. Label extraction for FG_BG multiplies both prediction
and GT by the scene's object label (evaluation_results.py:40-51).

Accumulation happens in int64 on the host; cross-host reduction uses a
process_allgather sum (replacing torch.distributed.reduce over NCCL).
"""

from __future__ import annotations

import io
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import pandas

from corenet_tpu.data.dataset import VOID_LABEL_NAME
from corenet_tpu.eval import metrics as vm
from corenet_tpu.utils import fs

GLOBAL_CLASS_NAME = "__global__"


def extract_labels(pmf: jnp.ndarray, gt_grid: jnp.ndarray,
                   scene_fg_labels: jnp.ndarray, task_type: str):
  """argmax labels from a class PMF; for FG_BG both prediction and GT are
  multiplied by the scene's (single) object label.

  Args:
    pmf: float32[B, D, H, W, C].
    gt_grid: int32[B, D, H, W].
    scene_fg_labels: int32[B] — the first mesh's label per scene (only
      used for FG_BG; single-object scenes).
  """
  pred = jnp.argmax(pmf, axis=-1).astype(jnp.int32)
  gt = gt_grid
  if task_type == "FG_BG":
    lbl = scene_fg_labels[:, None, None, None]
    pred = pred * lbl
    gt = gt * lbl
  return pred, gt


def compute_voxel_metrics_df(confusion_matrix: np.ndarray,
                             classes: Sequence[str]) -> pandas.DataFrame:
  """Rows (iou, precision, recall) × columns (classes..., __global__)."""
  tfpn = vm.compute_tfpn(confusion_matrix)
  tfpn_fg = vm.compute_tfpn_fg(confusion_matrix)
  m = vm.compute_voxel_metrics(tfpn)
  m_fg = vm.compute_voxel_metrics(tfpn_fg)
  df = pandas.DataFrame(
      {"iou": m.iou, "precision": m.precision, "recall": m.recall},
      index=list(classes)).T
  df_fg = pandas.DataFrame(
      {"iou": [m_fg.iou], "precision": [m_fg.precision],
       "recall": [m_fg.recall]}, index=[GLOBAL_CLASS_NAME]).T
  return pandas.concat([df, df_fg], axis=1)


class QuantitativeResults:
  """Accumulates a confusion matrix over eval batches."""

  def __init__(self, classes: Sequence[str], task_type: str):
    self.classes = list(classes)
    self.task_type = task_type
    self.confusion = np.zeros([len(classes)] * 2, np.int64)
    self.voxel_metrics_df: Optional[pandas.DataFrame] = None

  def add_batch(self, pmf: jnp.ndarray, gt_grid: jnp.ndarray,
                scene_fg_labels, valid: Optional[np.ndarray] = None):
    """valid: optional bool[B] mask for padded batch entries."""
    pred, gt = extract_labels(pmf, gt_grid,
                              jnp.asarray(scene_fg_labels, jnp.int32),
                              self.task_type)
    if valid is not None and not np.asarray(valid).all():
      idx = np.nonzero(np.asarray(valid))[0]
      pred = jnp.take(pred, jnp.asarray(idx), axis=0)
      gt = jnp.take(gt, jnp.asarray(idx), axis=0)
    cm = vm.confusion_matrix(pred, gt, len(self.classes))
    self.confusion += np.asarray(jax.device_get(cm), np.int64)

  def reduce_across_hosts(self):
    """Sums confusion matrices over all JAX processes."""
    if jax.process_count() > 1:
      from jax.experimental import multihost_utils
      total = multihost_utils.process_allgather(self.confusion)
      self.confusion = np.asarray(total, np.int64).sum(axis=0)

  def compute_metrics(self):
    self.reduce_across_hosts()
    self.voxel_metrics_df = compute_voxel_metrics_df(self.confusion,
                                                     self.classes)
    return self.voxel_metrics_df

  def get_mean_iou(self) -> float:
    mm = self.voxel_metrics_df
    assert mm is not None
    assert mm.columns[-1] == GLOBAL_CLASS_NAME
    assert mm.columns[0] == VOID_LABEL_NAME
    return float(mm.iloc[:, 1:-1].T.mean().iou)

  def write_csv(self, path: str):
    buf = io.StringIO()
    self.voxel_metrics_df.to_csv(buf)
    fs.makedirs(fs.dirname(path))
    fs.write_text(path, buf.getvalue())

  def scalar_summaries(self) -> dict:
    """General/* scalars with the reference's tensorboard names."""
    mm = self.voxel_metrics_df
    means = mm.iloc[:, 1:-1].T.mean()
    fgbg = mm.iloc[:, -1]
    out = {
        "General/mIoU": float(means.iou),
        "General/mPrecision": float(means.precision),
        "General/mRecall": float(means.recall),
        "General/fgbgIoU": float(fgbg.iou),
        "General/fgbgPrecision": float(fgbg.precision),
        "General/fgbgRecall": float(fgbg.recall),
    }
    for cls in mm.columns[:-1]:
      col = mm[cls]
      out[f"IoU/{cls}"] = float(col.iou)
      out[f"Precision/{cls}"] = float(col.precision)
      out[f"Recall/{cls}"] = float(col.recall)
    return out
