"""Model-stack tests: conv wrappers vs torch oracle, BatchRenorm math,
skip-gather semantics, and full-model shape/grad checks."""

import numpy as np
import numpy.testing as tt
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from corenet_tpu.models import layers, losses
from corenet_tpu.models.batch_renorm import BatchRenorm
from corenet_tpu.models.corenet import CoreNet, CoreNetConfig, DecoderConfig
from corenet_tpu.models.skip import sample_grid2d


def _rand(rng, *shape):
  return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("k,s,p", [(1, 1, 0), (3, 1, 1), (3, 2, 1),
                                   (7, 2, 3), (5, 1, 2)])
def test_conv2d_matches_torch(k, s, p):
  rng = np.random.default_rng(0)
  x = _rand(rng, 2, 16, 16, 5)
  m = layers.Conv(features=7, kernel_size=k, ndim=2, stride=s, padding=p)
  params = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.asarray(x))
  y = np.asarray(jax.jit(m.apply)(params, jnp.asarray(x)))

  w = np.asarray(params["params"]["kernel"])  # [kh, kw, I, O]
  b = np.asarray(params["params"]["bias"])
  ty = F.conv2d(torch.tensor(x.transpose(0, 3, 1, 2)),
                torch.tensor(w.transpose(3, 2, 0, 1)), torch.tensor(b),
                stride=s, padding=p)
  tt.assert_allclose(y, ty.numpy().transpose(0, 2, 3, 1), rtol=1e-4,
                     atol=1e-4)


@pytest.mark.parametrize("k,s,p,op,n", [(4, 4, 0, 0, 1), (3, 2, 1, 1, 4),
                                        (7, 2, 3, 1, 4), (7, 4, 3, 1, 3)])
def test_convtranspose3d_matches_torch(k, s, p, op, n):
  rng = np.random.default_rng(1)
  x = _rand(rng, 2, n, n, n, 3)
  m = layers.ConvTranspose(features=4, kernel_size=k, ndim=3, stride=s,
                           padding=p, output_padding=op)
  params = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.asarray(x))
  y = np.asarray(jax.jit(m.apply)(params, jnp.asarray(x)))

  w = np.asarray(params["params"]["kernel"])  # [kd, kh, kw, I, O]
  b = np.asarray(params["params"]["bias"])
  ty = F.conv_transpose3d(
      torch.tensor(x.transpose(0, 4, 1, 2, 3)),
      torch.tensor(w.transpose(3, 4, 0, 1, 2)),  # torch wants [I, O, kd, kh, kw]
      torch.tensor(b), stride=s, padding=p, output_padding=op)
  expected_size = (n - 1) * s - 2 * p + k + op
  assert y.shape == (2, expected_size, expected_size, expected_size, 4)
  tt.assert_allclose(y, ty.numpy().transpose(0, 2, 3, 4, 1), rtol=1e-4,
                     atol=1e-4)


def test_conv3d_matches_torch():
  rng = np.random.default_rng(2)
  x = _rand(rng, 1, 6, 6, 6, 4)
  m = layers.Conv(features=5, kernel_size=5, ndim=3, padding=2)
  params = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.asarray(x))
  y = np.asarray(jax.jit(m.apply)(params, jnp.asarray(x)))
  w = np.asarray(params["params"]["kernel"])
  b = np.asarray(params["params"]["bias"])
  ty = F.conv3d(torch.tensor(x.transpose(0, 4, 1, 2, 3)),
                torch.tensor(w.transpose(4, 3, 0, 1, 2)), torch.tensor(b),
                padding=2)
  tt.assert_allclose(y, ty.numpy().transpose(0, 2, 3, 4, 1), rtol=1e-4,
                     atol=1e-4)


def test_max_pool_matches_torch():
  rng = np.random.default_rng(3)
  x = np.abs(_rand(rng, 2, 8, 8, 3))  # post-ReLU values are non-negative
  y = np.asarray(layers.max_pool_2d(jnp.asarray(x), 3, 2, 1))
  ty = torch.nn.MaxPool2d(3, 2)(F.pad(
      torch.tensor(x.transpose(0, 3, 1, 2)), (1, 1, 1, 1)))
  tt.assert_allclose(y, ty.numpy().transpose(0, 2, 3, 1), rtol=1e-6)


def _torch_batch_renorm(x_nchw, running_mean, running_var, steps, weight,
                        bias, eps=1e-3, momentum=0.01):
  """Independent oracle implementing the documented BatchRenorm math."""
  x = torch.tensor(x_nchw)
  running_std = np.sqrt(running_var + eps)
  nt = steps
  d_max = np.clip(5.0 * (nt - 5000) / 20000, 0.0, 5.0)
  r_max = 1.0 + np.clip(2.0 * (nt - 5000) / 35000, 0.0, 2.0)
  dims = [i for i in range(x.dim()) if i != 1]
  b_mean = x.mean(dims).numpy()
  b_var = x.var(dims, unbiased=False).numpy()
  b_std = np.sqrt(b_var + eps)
  r = np.clip(b_std / running_std, 1 / r_max, r_max)
  d = np.clip((b_mean - running_mean) / running_std, -d_max, d_max)
  view = [1, -1] + [1] * (x.dim() - 2)
  xn = ((x.numpy() - b_mean.reshape(view)) / b_std.reshape(view) *
        r.reshape(view) + d.reshape(view))
  c = x.shape[1]
  new_var = running_var + momentum * (b_var * c / (c - 1) - running_var)
  new_mean = running_mean + momentum * (b_mean - running_mean)
  out = weight.reshape(view) * xn + bias.reshape(view)
  return out, new_mean, new_var


@pytest.mark.parametrize("steps", [0, 10000, 100000])
def test_batch_renorm_matches_oracle(steps):
  rng = np.random.default_rng(4)
  x = _rand(rng, 4, 6, 6, 8) * 3 + 1
  m = BatchRenorm(eps=1e-3)
  variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
  # Seed non-trivial running stats and step count.
  rm = rng.standard_normal(8).astype(np.float32)
  rv = np.abs(rng.standard_normal(8)).astype(np.float32) + 0.5
  variables = {
      "params": variables["params"],
      "batch_stats": {
          "mean": jnp.asarray(rm), "var": jnp.asarray(rv),
          "steps": jnp.asarray(steps, jnp.int32)
      },
  }
  y, updated = m.apply(variables, jnp.asarray(x), True,
                       mutable=["batch_stats"])
  w = np.asarray(variables["params"]["scale"])
  b = np.asarray(variables["params"]["bias"])
  ty, new_mean, new_var = _torch_batch_renorm(
      x.transpose(0, 3, 1, 2), rm, rv, steps, w, b)
  tt.assert_allclose(np.asarray(y), ty.transpose(0, 2, 3, 1), rtol=1e-4,
                     atol=1e-5)
  tt.assert_allclose(np.asarray(updated["batch_stats"]["mean"]), new_mean,
                     rtol=1e-4, atol=1e-6)
  tt.assert_allclose(np.asarray(updated["batch_stats"]["var"]), new_var,
                     rtol=1e-4, atol=1e-5)
  assert int(updated["batch_stats"]["steps"]) == steps + 1

  # Eval mode uses running stats and mutates nothing.
  y_eval = m.apply(variables, jnp.asarray(x), False)
  expected = (x - rm) / np.sqrt(rv + 1e-3) * w + b
  tt.assert_allclose(np.asarray(y_eval), expected, rtol=1e-4, atol=1e-5)


def test_sample_grid2d_semantics():
  """Identity-ish projection: voxel (x, y, z) reads pixel (trunc coords)."""
  b, h, w, c = 1, 4, 4, 2
  rng = np.random.default_rng(5)
  grid2d = _rand(rng, b, h, w, c)
  # Projection mapping voxel x∈[0,4] → ndc [-1,1], y likewise; z → w=1.
  proj = np.array([[
      [0.5, 0, 0, -1],
      [0, 0.5, 0, -1],
      [0, 0, 1, 0],
      [0, 0, 0, 1],
  ]], np.float32)
  loc = np.full((1, 3), 0.5, np.float32)
  out = np.asarray(sample_grid2d(jnp.asarray(grid2d), jnp.asarray(proj),
                                 jnp.asarray(loc), (4, 4, 4)))
  assert out.shape == (1, 4, 4, 4, 2)
  # Voxel (x,y,z) center (x+.5, y+.5) → ndc ((x+.5)/2-1) → [0,1]: (x+.5)/4
  # → pixel trunc((x+.5)/4*4) = x. So out[0,z,y,x] == grid2d[0,y,x].
  for z in range(4):
    tt.assert_allclose(out[0, z], grid2d[0], rtol=1e-5)

  # Behind-camera: negative z in clip space → outside value.
  proj_behind = proj.copy()
  proj_behind[0, 2, 2] = -1.0
  out = np.asarray(sample_grid2d(jnp.asarray(grid2d), jnp.asarray(proj_behind),
                                 jnp.asarray(loc), (4, 4, 4),
                                 outside_value=-7.0))
  tt.assert_allclose(out, -7.0)

  # Out-of-image projection → outside value.
  proj_out = proj.copy()
  proj_out[0, 0, 3] = 10.0  # shift ndc x by +10
  out = np.asarray(sample_grid2d(jnp.asarray(grid2d), jnp.asarray(proj_out),
                                 jnp.asarray(loc), (4, 4, 4),
                                 outside_value=3.0))
  tt.assert_allclose(out, 3.0)


def test_sample_grid2d_truncation_quirk():
  """x in (-1, 0) truncates to pixel 0 (torch .to(int64) semantics)."""
  grid2d = np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
  proj = np.array([[
      [0.5, 0, 0, -1.125],   # x = 0.5*vx - 1.125: voxel center 0.5 → -0.875
      [0, 0.5, 0, -1],
      [0, 0, 1, 0],
      [0, 0, 0, 1],
  ]], np.float32)
  loc = np.full((1, 3), 0.5, np.float32)
  out = np.asarray(sample_grid2d(jnp.asarray(grid2d), jnp.asarray(proj),
                                 jnp.asarray(loc), (1, 4, 4),
                                 outside_value=-1.0))
  # voxel x=0: ndc -0.875 → [0,1]: 0.0625 → pixel trunc(0.25)=0 → in image.
  # voxel x=1: ndc -0.375 → 0.3125 → pixel 1.25 → 1.
  # pixel coord of x=0 is fractional 0.25 → reads pixel 0, NOT outside.
  assert out[0, 0, 0, 0, 0] == grid2d[0, 0, 0, 0]


def test_corenet_forward_shapes_and_train_step():
  import functools

  cfg = CoreNetConfig(decoder=DecoderConfig(
      resolution=(32, 32, 32), num_output_channels=3, last_upscale_factor=2,
      latent_channels=64, skip_fraction=0.75))
  model = CoreNet(cfg)
  rng = np.random.default_rng(6)
  image = jnp.asarray((rng.random((2, 64, 64, 3)) * 255).astype(np.uint8))
  proj = np.broadcast_to(np.eye(4, dtype=np.float32), (2, 4, 4)).copy()
  proj[:, 0, 0] = 1 / 16.0
  proj[:, 1, 1] = 1 / 16.0
  proj[:, 0, 3] = -1
  proj[:, 1, 3] = -1
  proj = jnp.asarray(proj)
  loc = jnp.full((2, 3), 0.5, jnp.float32)

  # Un-jitted eager execution is pathologically slow for dilated convs on
  # the CPU backend, so everything heavy here runs under jit.
  init = jax.jit(functools.partial(model.init, train=False))
  variables = init(jax.random.PRNGKey(0), image, proj, loc)
  apply = jax.jit(functools.partial(model.apply, train=False))
  logits = apply(variables, image, proj, loc)
  assert logits.shape == (2, 32, 32, 32, 3)
  assert np.isfinite(np.asarray(logits)).all()

  # One gradient step through the full model incl. mutable batch stats.
  gt = jnp.zeros((2, 32, 32, 32), jnp.int32)

  def loss_fn(params):
    out, updates = model.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        image, proj, loc, train=True, mutable=["batch_stats"])
    return losses.xent_times_iou_agnostic(gt, out), updates

  (loss, updates), grads = jax.jit(
      jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])
  assert np.isfinite(float(loss))
  flat = jax.tree_util.tree_leaves(grads)
  assert all(np.isfinite(np.asarray(g)).all() for g in flat)
  # batch stats advanced
  sample_bn = updates["batch_stats"]["encoder"]["stage1_bn"]["steps"]
  assert int(sample_bn) == 1


def test_batch_renorm_bf16_variance_no_cancellation():
  """The bf16 one-pass variance is SHIFTED by the running mean
  (ADVICE r3): with activation variance ≪ mean² (post-ReLU tensors with
  large means), the naive E[x²]−mean² form loses everything to f32
  cancellation (at mean≈512, f32 resolution of E[x²] is ~0.03 while the
  true variance is ~1e-4); the shifted form must recover it to ~0.1%."""
  rng = np.random.default_rng(11)
  ch, base, momentum = 8, 512.0, 0.01
  x32 = base + rng.standard_normal((64, 16, 16, ch)).astype(np.float32) * 0.01
  x = jnp.asarray(x32, jnp.bfloat16)
  x64 = np.asarray(x, np.float32).astype(np.float64)

  m = BatchRenorm(eps=1e-3, momentum=momentum)
  variables = m.init(jax.random.PRNGKey(0), x, True)
  rv = np.ones(ch, np.float32)
  variables = {
      "params": variables["params"],
      "batch_stats": {
          # Running mean near the activation mean — the trained-state
          # regime where the shift matters (and is available).
          "mean": jnp.full((ch,), base, jnp.float32),
          "var": jnp.asarray(rv),
          "steps": jnp.asarray(10_000, jnp.int32),
      },
  }
  _, updated = m.apply(variables, x, True, mutable=["batch_stats"])
  new_var = np.asarray(updated["batch_stats"]["var"], np.float64)
  # Invert the running update to recover the batch variance estimate.
  b_var = ((new_var - (1 - momentum) * rv) / momentum) * (ch - 1) / ch
  exact = x64.reshape(-1, ch).var(axis=0)
  tt.assert_allclose(b_var, exact, rtol=1e-3)


def test_batch_renorm_ramp_start_knob():
  """Opt-in stabilizer (VERDICT r3 #9): ramp_start=0 engages the r/d
  correction from step 0 (train output pulled toward running stats),
  while the default reproduces the reference's step-5000 start (r=1,
  d=0 → pure batch statistics below 5000). Parameters are unchanged."""
  from corenet_tpu.models import batch_renorm as br
  rng = np.random.default_rng(7)
  x = _rand(rng, 4, 6, 6, 8) * 3 + 1
  rm = rng.standard_normal(8).astype(np.float32)
  rv = np.abs(rng.standard_normal(8)).astype(np.float32) + 0.5

  def run(steps, **kw):
    m = BatchRenorm(eps=1e-3, **kw)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
    variables = {
        "params": variables["params"],
        "batch_stats": {"mean": jnp.asarray(rm), "var": jnp.asarray(rv),
                        "steps": jnp.asarray(steps, jnp.int32)},
    }
    y, _ = m.apply(variables, jnp.asarray(x), True,
                   mutable=["batch_stats"])
    return np.asarray(y)

  base = run(100)
  stabilized = run(100, ramp_start=0)
  # At step 100 the default ramps are off; ramp_start=0 has them 100
  # steps in (d_max=0.025, r_max≈1.006) — a small but real correction.
  assert np.abs(stabilized - base).max() > 1e-4
  # The process-global default routes the same knob (set_ramp_start).
  br.set_ramp_start(0)
  try:
    tt.assert_allclose(run(100), stabilized, rtol=1e-6)
  finally:
    br.set_ramp_start(5000)
  tt.assert_allclose(run(100), base, rtol=1e-6)
  # Far past every ramp, both settings saturate identically.
  tt.assert_allclose(run(100_000, ramp_start=0), run(100_000), rtol=1e-6)
