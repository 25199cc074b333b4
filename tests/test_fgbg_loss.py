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


def test_phase_packed_view_equals_fine_loss():
  """The phase-output training path (train/step.py) pairs a phased view
  of the logits with a phased GT permutation; the loss must equal the
  fine-grid loss exactly (same (gt, pred) multiset)."""
  rng = np.random.default_rng(9)
  b, d, h, w = 2, 8, 8, 8
  gt = jnp.asarray(rng.integers(0, 2, (b, d, h, w)), jnp.int32)
  logits = jnp.asarray(rng.standard_normal((b, d, h, w, 2)) * 2,
                       jnp.float32)
  ref = losses.iou_fgbg(gt, logits)

  # Build the phase-packed logits the packed decoder would emit:
  # packed[z,y,x, ((pz*2+py)*2+px)*C + c] = fine[2z+pz, 2y+py, 2x+px, c].
  d2, h2, w2 = d // 2, h // 2, w // 2
  lp = logits.reshape(b, d2, 2, h2, 2, w2, 2, 2)
  lp = jnp.transpose(lp, (0, 1, 3, 5, 2, 4, 6, 7))
  lp = lp.reshape(b, d2, h2, w2, 16)

  # The step's pairing: phased GT copy + row-major logits view.
  gp = gt.reshape(b, d2, 2, h2, 2, w2, 2)
  gp = jnp.transpose(gp, (0, 1, 3, 5, 2, 4, 6)).reshape(b, d2, h2, w2 * 8)
  got = losses.iou_fgbg(gp, lp.reshape(b, d2, h2, w2 * 8, 2))
  tt.assert_allclose(float(got), float(ref), rtol=1e-6)


def test_deep_phase_view_equals_fine_loss():
  """The factor-64 pairing (train/step.py): packed decoder with the
  stage-6 rm-interleave skipped — fine index Z = 4*j + 2*rm + pz,
  channel order (rm0, rm1, rm2, pz, py, px, c)."""
  rng = np.random.default_rng(29)
  b, d, h, w, c = 2, 8, 8, 8, 2
  gt = jnp.asarray(rng.integers(0, 2, (b, d, h, w)), jnp.int32)
  logits = jnp.asarray(rng.standard_normal((b, d, h, w, c)) * 2,
                       jnp.float32)
  ref = losses.iou_fgbg(gt, logits)

  d4, h4, w4 = d // 4, h // 4, w // 4
  lp = logits.reshape(b, d4, 2, 2, h4, 2, 2, w4, 2, 2, c)
  lp = jnp.transpose(lp, (0, 1, 4, 7, 2, 5, 8, 3, 6, 9, 10))
  lp = lp.reshape(b, d4, h4, w4, 64 * c)

  gp = gt.astype(jnp.uint8).reshape(b, d4, 2, 2, h4, 2, 2, w4, 2, 2)
  gp = jnp.transpose(gp, (0, 1, 4, 7, 2, 5, 8, 3, 6, 9))
  gp = gp.reshape(b, d4, h4, w4 * 64)
  got = losses.iou_fgbg(gp, lp.reshape(b, d4, h4, w4 * 64, c))
  tt.assert_allclose(float(got), float(ref), rtol=1e-6)
