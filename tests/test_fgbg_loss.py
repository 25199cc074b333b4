"""Parity tests for the Pallas FG_BG loss-sums kernel vs the XLA
iou_fgbg path it accelerates (interpret mode on CPU; CORENET_TEST_TPU=1
exercises the compiled kernel)."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as tt

from corenet_tpu.models import losses
from corenet_tpu.ops import fgbg_loss


def _loss_via_kernel(gt, logits):
  diff = logits[..., 1] - logits[..., 0]
  inter, union = fgbg_loss.fgbg_sums(diff, gt, interpret=True)
  iou = inter / jnp.where(union == 0, 1.0, union)
  return 1.0 - iou.mean()


def _rand(b=2, d=8, h=32, w=32, seed=0):
  # d*h*w = 8192 = 64 rows of 128 lanes: exercises block accumulation.
  rng = np.random.default_rng(seed)
  gt = jnp.asarray(rng.integers(0, 2, (b, d, h, w)), jnp.int32)
  logits = jnp.asarray(rng.standard_normal((b, d, h, w, 2)) * 3,
                       jnp.float32)
  return gt, logits


def test_loss_matches_xla_path():
  gt, logits = _rand()
  ref = losses.iou_fgbg(gt, logits)
  got = _loss_via_kernel(gt, logits)
  tt.assert_allclose(float(got), float(ref), rtol=1e-6)


def test_grad_matches_xla_path():
  gt, logits = _rand(seed=3)
  g_ref = jax.grad(lambda l: losses.iou_fgbg(gt, l))(logits)
  g_got = jax.grad(lambda l: _loss_via_kernel(gt, l))(logits)
  tt.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                     rtol=1e-5, atol=1e-8)


def test_empty_union_batch():
  """A scene with no foreground and fully-negative predictions keeps the
  union==0 guard semantics."""
  b, d, h, w = 1, 8, 16, 8
  gt = jnp.zeros((b, d, h, w), jnp.int32)
  logits = jnp.zeros((b, d, h, w, 2), jnp.float32)
  ref = losses.iou_fgbg(gt, logits)
  got = _loss_via_kernel(gt, logits)
  tt.assert_allclose(float(got), float(ref), rtol=1e-6)


def test_bf16_diff_supported():
  gt, logits = _rand(seed=5)
  diff = (logits[..., 1] - logits[..., 0]).astype(jnp.bfloat16)
  inter, union = fgbg_loss.fgbg_sums(diff, gt, interpret=True)
  pred = jax.nn.sigmoid(diff.astype(jnp.float32))
  fg = gt == 1
  tt.assert_allclose(np.asarray(inter),
                     np.asarray(jnp.where(fg, pred, 0).sum((1, 2, 3))),
                     rtol=1e-4)
  tt.assert_allclose(np.asarray(union),
                     np.asarray(jnp.where(fg, 1.0, pred).sum((1, 2, 3))),
                     rtol=1e-4)
