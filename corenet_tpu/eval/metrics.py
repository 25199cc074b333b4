"""Voxel evaluation metrics: confusion matrices, TFPN, IoU/precision/recall.

Math parity with the reference (/root/reference/src/corenet/
voxel_metrics.py): confusion[gt, pred] scatter-add; per-class TP/TN/FP/FN
from the matrix; binary FG/BG TFPN by collapsing classes ≥ 1; metrics in
float64 with NaN for classes absent from both GT and prediction
(nan_tp_div semantics: NaN where tp == 0).

Division of labor (TPU-native): the per-batch confusion matrix is computed
on-device (one bincount over gt*C+pred — int32 is safe for per-batch voxel
counts); accumulation across batches and the float64 metric math happen on
the host in numpy, because full-dataset counts (~5e11 voxels) exceed both
int32 and float32 integer range.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np


def confusion_matrix(predicted: jnp.ndarray, gt: jnp.ndarray,
                     num_classes: int) -> jnp.ndarray:
  """Per-batch confusion matrix int32[num_classes, num_classes]; rows = GT,
  columns = predicted. Device-side, jittable."""
  index = (gt.astype(jnp.int32) * num_classes +
           predicted.astype(jnp.int32)).reshape(-1)
  counts = jnp.bincount(index, length=num_classes * num_classes)
  return counts.reshape(num_classes, num_classes).astype(jnp.int32)


@dataclasses.dataclass
class TfpnValues:
  """True/false positives/negatives, float64[num_classes] (or scalars)."""
  tp: np.ndarray
  tn: np.ndarray
  fp: np.ndarray
  fn: np.ndarray


def compute_tfpn(matrix: np.ndarray) -> TfpnValues:
  """Per-class TFPN from a confusion matrix (voxel_metrics.py:61-97)."""
  matrix = np.asarray(matrix, np.float64)
  num_classes = matrix.shape[0]
  assert matrix.shape == (num_classes, num_classes)
  tp = np.diagonal(matrix).copy()
  fp = matrix.sum(axis=0) - tp   # column sums: predicted-as-class
  fn = matrix.sum(axis=1) - tp   # row sums: gt-is-class
  tn = matrix.sum() - tp - fp - fn
  return TfpnValues(tp, tn, fp, fn)


def compute_tfpn_fg(matrix: np.ndarray) -> TfpnValues:
  """2-class foreground/background TFPN (voxel_metrics.py:100-107)."""
  matrix = np.asarray(matrix, np.float64)
  tp = matrix[1:, 1:].sum()
  tn = matrix[0, 0]
  fp = matrix[0, 1:].sum()
  fn = matrix[1:, 0].sum()
  return TfpnValues(*[np.asarray(v) for v in (tp, tn, fp, fn)])


@dataclasses.dataclass
class VoxelMetrics:
  iou: np.ndarray
  precision: np.ndarray
  recall: np.ndarray


def _nan_tp_div(tp: np.ndarray, y: np.ndarray) -> np.ndarray:
  """NaN where the class has no true positives (voxel_metrics.py:118-120)."""
  with np.errstate(divide="ignore", invalid="ignore"):
    return np.where(tp == 0, math.nan, tp / np.where(y == 0, 1, y))


def compute_voxel_metrics(tfpn: TfpnValues) -> VoxelMetrics:
  tp, fp, fn = (np.asarray(v, np.float64) for v in (tfpn.tp, tfpn.fp,
                                                    tfpn.fn))
  return VoxelMetrics(
      iou=_nan_tp_div(tp, tp + fp + fn),
      precision=_nan_tp_div(tp, tp + fp),
      recall=_nan_tp_div(tp, tp + fn))
