"""Voxel-metrics golden tests (hand-computed confusion matrix / TFPN values
matching the reference's voxel_metrics_test.py spec).

For classes with no true positives the implementation yields NaN — the
behavior the eval pipeline relies on (pandas skips NaN when averaging
mIoU; absent classes must not drag the mean to zero). The reference's own
stale unit test expects 0 there while its pipeline produces NaN; we pin
the pipeline behavior.
"""

import numpy as np
import numpy.testing as tt
import jax.numpy as jnp

from corenet_tpu.eval import metrics


_GT = np.array([
    [[3, 2, 2, 4], [4, 3, 2, 2], [3, 1, 3, 0]],
    [[3, 0, 1, 3], [2, 3, 1, 1], [2, 3, 0, 4]],
], np.int32)
_PRED = np.array([
    [[0, 2, 3, 1], [1, 1, 1, 3], [4, 0, 2, 3]],
    [[1, 0, 1, 4], [2, 4, 4, 0], [4, 2, 4, 2]],
], np.int32)
_EXPECTED_CONFUSION = np.array([
    [1, 0, 0, 1, 1],
    [2, 1, 0, 0, 1],
    [0, 1, 2, 2, 1],
    [1, 2, 2, 0, 3],
    [0, 2, 1, 0, 0],
], np.int32)


def test_confusion_matrix():
  cm = metrics.confusion_matrix(jnp.asarray(_PRED), jnp.asarray(_GT), 5)
  assert cm.dtype == jnp.int32
  tt.assert_array_equal(np.asarray(cm), _EXPECTED_CONFUSION)


def test_compute_tfpn():
  tfpn = metrics.compute_tfpn(_EXPECTED_CONFUSION)
  tt.assert_array_equal(tfpn.tp, [1, 1, 2, 0, 0])
  tt.assert_array_equal(tfpn.tn, [18, 15, 15, 13, 15])
  tt.assert_array_equal(tfpn.fp, [3, 5, 3, 3, 6])
  tt.assert_array_equal(tfpn.fn, [2, 3, 4, 8, 3])


def test_compute_tfpn_fg():
  tfpn = metrics.compute_tfpn_fg(_EXPECTED_CONFUSION)
  assert tfpn.tp == _EXPECTED_CONFUSION[1:, 1:].sum()
  assert tfpn.tn == 1
  assert tfpn.fp == _EXPECTED_CONFUSION[0, 1:].sum()
  assert tfpn.fn == _EXPECTED_CONFUSION[1:, 0].sum()


def test_compute_voxel_metrics():
  tfpn = metrics.TfpnValues(
      tp=np.array([1, 1, 2, 0, 0]),
      tn=np.array([18, 15, 15, 13, 15]),
      fp=np.array([3, 5, 3, 3, 6]),
      fn=np.array([2, 3, 4, 8, 3]))
  mm = metrics.compute_voxel_metrics(tfpn)
  assert mm.iou.dtype == np.float64
  tt.assert_allclose(mm.iou[:3], [1 / 6, 1 / 9, 2 / 9])
  tt.assert_allclose(mm.precision[:3], [0.25, 1 / 6, 0.4])
  tt.assert_allclose(mm.recall[:3], [1 / 3, 0.25, 1 / 3])
  # Absent classes → NaN (skipped by mean-IoU aggregation).
  assert np.isnan(mm.iou[3:]).all()
  assert np.isnan(mm.precision[3:]).all()
  assert np.isnan(mm.recall[3:]).all()
