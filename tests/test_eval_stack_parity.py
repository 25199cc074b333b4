"""Eval-stack bit-parity against the reference's torch metrics oracle.

The released checkpoints' headline numbers flow through
voxel_metrics.py + evaluation_results.py (pure CPU torch, importable
here). Identical label/PMF arrays are fed through BOTH stacks and the
confusion matrix, per-class metric rows, DataFrame CSV text, and mIoU
must agree to float64 precision — pinning argmax semantics, the FG_BG
label multiply, TFPN algebra, the NaN-for-absent-class rule, and the
mean-IoU column slicing (reference voxel_metrics.py:33-138,
evaluation_results.py:40-51,188-266)."""

import os
import sys
import types

import numpy as np
import numpy.testing as tt
import jax.numpy as jnp
import pandas
import pytest

REFERENCE_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_SRC),
    reason="reference implementation not available as an oracle")


def _import_reference_voxel_metrics():
  if "dataclasses_jsonschema" not in sys.modules:
    fake = types.ModuleType("dataclasses_jsonschema")
    fake.JsonSchemaMixin = type("JsonSchemaMixin", (), {})
    sys.modules["dataclasses_jsonschema"] = fake
  sys.path.insert(0, REFERENCE_SRC)
  try:
    from corenet import voxel_metrics as ref_vm
  finally:
    sys.path.remove(REFERENCE_SRC)
  return ref_vm


def _reference_metrics_df(ref_vm, confusion, classes):
  """The reference's DataFrame assembly (evaluation_results.py:188-211),
  mirrored on the oracle's primitives (importing evaluation_results
  itself drags in GL/visualization deps)."""
  import dataclasses
  import torch as t
  cm = t.from_numpy(np.asarray(confusion, np.float64))
  tfpn = ref_vm.compute_tfpn(cm)
  tfpn_fg = ref_vm.compute_tfpn_fg(cm)
  metrics = ref_vm.compute_voxel_metrics(tfpn)
  fg = ref_vm.compute_voxel_metrics(tfpn_fg)
  metrics = {k: v.cpu().numpy() for k, v in
             dataclasses.asdict(metrics).items()}
  fg = {k: v.cpu().numpy() for k, v in dataclasses.asdict(fg).items()}
  df = pandas.DataFrame(metrics, index=list(classes)).T
  df_fg = pandas.DataFrame(fg, index=["__global__"]).T
  return pandas.concat([df, df_fg], axis=1)


@pytest.mark.parametrize("task_type", ["SEMANTIC", "FG_BG"])
def test_eval_stack_matches_reference(task_type):
  import torch as t
  from corenet_tpu.eval import metrics as vm
  from corenet_tpu.eval.results import (
      QuantitativeResults, compute_voxel_metrics_df, extract_labels)

  ref_vm = _import_reference_voxel_metrics()
  rng = np.random.default_rng(42)
  classes = ["__void__", "chair", "table", "lamp"]
  num_classes = len(classes)
  b, d, h, w = 3, 8, 8, 8
  if task_type == "FG_BG":
    c = 2
    fg_labels = np.array([1, 2, 3], np.int32)
  else:
    c = num_classes
    fg_labels = np.zeros((b,), np.int32)
  pmf = rng.random((b, d, h, w, c)).astype(np.float32)
  # Exact argmax ties in a few cells pin the tie-break rule too.
  pmf[0, 0, 0, :4, :2] = 0.5
  gt = rng.integers(0, 2 if task_type == "FG_BG" else num_classes,
                    (b, d, h, w)).astype(np.int32)
  # One class absent from both pred and GT → NaN row in both stacks.
  if task_type == "SEMANTIC":
    pmf[..., 3] = 0.0
    gt[gt == 3] = 0

  # --- repo stack ---
  pred_j, gt_j = extract_labels(jnp.asarray(pmf), jnp.asarray(gt),
                                jnp.asarray(fg_labels), task_type)
  cm_ours = np.asarray(vm.confusion_matrix(pred_j, gt_j, num_classes),
                       np.int64)

  # --- reference stack (extract_labels mirrored per
  # evaluation_results.py:40-51: argmax over the channel dim; FG_BG
  # multiplies pred and GT by the scene labels) ---
  pdf_t = t.from_numpy(np.moveaxis(pmf, -1, 1).copy())
  pred_t = pdf_t.argmax(dim=1).to(t.int32)
  gt_t = t.from_numpy(gt)
  if task_type == "FG_BG":
    lbl = t.from_numpy(fg_labels)[:, None, None, None]
    pred_t = pred_t * lbl
    gt_t = gt_t * lbl
  cm_ref = ref_vm.confusion_matrix(pred_t, gt_t, num_classes)
  tt.assert_array_equal(cm_ours, cm_ref.cpu().numpy().astype(np.int64))

  # --- metrics DataFrame: identical values, NaN placement, CSV text ---
  df_ours = compute_voxel_metrics_df(cm_ours, classes)
  df_ref = _reference_metrics_df(ref_vm, cm_ours, classes)
  assert list(df_ours.columns) == list(df_ref.columns)
  assert list(df_ours.index) == list(df_ref.index)
  ours = df_ours.to_numpy(np.float64)
  ref = df_ref.to_numpy(np.float64)
  tt.assert_array_equal(np.isnan(ours), np.isnan(ref))
  tt.assert_array_equal(np.nan_to_num(ours), np.nan_to_num(ref))
  assert df_ours.to_csv() == df_ref.to_csv()

  # --- mean IoU: the reference's column slicing (evaluation_results.py
  # get_mean_iou: classes excluding __void__ and __global__, NaN-skipped
  # by pandas mean) ---
  q = QuantitativeResults(classes, task_type)
  q.confusion += cm_ours
  q.compute_metrics()
  ref_miou = float(df_ref.iloc[:, 1:-1].T.mean().iou)
  tt.assert_array_equal(q.get_mean_iou(), ref_miou)
