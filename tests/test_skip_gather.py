"""Parity tests for the Pallas skip-gather kernel (ops/skip_gather.py)
against the XLA take_along_axis path it replaces.

Runs in interpret mode on the virtual CPU mesh; CORENET_TEST_TPU=1
exercises the compiled kernel on the real chip.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as tt
import pytest

from corenet_tpu.models import skip
from corenet_tpu.ops.skip_gather import skip_gather


def _ref_gather(fmap, px, py):
  b, h2, w2, c = fmap.shape
  flat = fmap.reshape(b, h2 * w2, c)
  idx = py * w2 + px
  return jnp.take_along_axis(flat, idx[:, :, None], axis=1)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_matches_take_along_axis(dtype):
  rng = np.random.default_rng(0)
  b, h2, w2, c, n = 2, 10, 9, 5, 700  # n not a TILE_N multiple: pad path
  fmap = jnp.asarray(rng.standard_normal((b, h2, w2, c)), dtype)
  px = jnp.asarray(rng.integers(0, w2, (b, n)), jnp.int32)
  py = jnp.asarray(rng.integers(0, h2, (b, n)), jnp.int32)
  out = skip_gather(fmap, px, py)
  ref = _ref_gather(fmap, px, py)
  if dtype == jnp.bfloat16:
    assert bool((out == ref).all())  # one-hot matmul selection is exact
  else:
    tt.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("h2,w2,c", [(34, 34, 24), (66, 66, 12),
                                     (18, 18, 16)])
def test_column_blocked_shapes_exact(h2, w2, c):
  """Production skip shapes across CB regimes: 34² → CB=3 (the
  column-blocked layout), 66² → CB=1 (plain rows), 18² → CB=7 with a
  partial final block. Forward bit-exact, backward parity."""
  rng = np.random.default_rng(h2)
  b, n = 2, 2048
  fmap = jnp.asarray(rng.standard_normal((b, h2, w2, c)), jnp.bfloat16)
  px = jnp.asarray(rng.integers(0, w2, (b, n)), jnp.int32)
  py = jnp.asarray(rng.integers(0, h2, (b, n)), jnp.int32)
  out = skip_gather(fmap, px, py)
  ref = _ref_gather(fmap, px, py)
  assert bool((out == ref).all())
  ct = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
  g1 = jax.grad(lambda f: (skip_gather(f, px, py) * ct).sum())(
      fmap.astype(jnp.float32))
  g2 = jax.grad(lambda f: (_ref_gather(f, px, py) * ct).sum())(
      fmap.astype(jnp.float32))
  tt.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)


def test_gradient_matches_scatter_add():
  rng = np.random.default_rng(1)
  b, h2, w2, c, n = 2, 12, 7, 3, 1024
  fmap = jnp.asarray(rng.standard_normal((b, h2, w2, c)), jnp.float32)
  # Repeated indices so the scatter-add accumulates multiple cotangents.
  px = jnp.asarray(rng.integers(0, 3, (b, n)), jnp.int32)
  py = jnp.asarray(rng.integers(0, 3, (b, n)), jnp.int32)
  ct = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
  g1 = jax.grad(lambda f: (skip_gather(f, px, py) * ct).sum())(fmap)
  g2 = jax.grad(lambda f: (_ref_gather(f, px, py) * ct).sum())(fmap)
  tt.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)


def test_sample_grid2d_pallas_path_matches_xla():
  """End-to-end sample_grid2d with projection, behind-camera and
  out-of-image voxels: the folded-index Pallas path must reproduce the
  reference-quirk XLA path."""
  rng = np.random.default_rng(2)
  b, res, c = 2, (16, 16, 16), 4
  h = w = 16
  g2d = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
  mats = []
  for i in range(b):
    s = 2.6 / 16  # slightly over-wide: some voxels project off-image
    m = np.array([[s, 0, 0.01 * i, -1.2], [0, s, 0.005, -1.1],
                  [0, 0.002, 1.0 / 16, -0.15],  # some depths negative
                  [0, 0, 0.01, 1.05]], np.float32)
    mats.append(m)
  vpm = jnp.asarray(np.stack(mats))
  vsl = jnp.full((b, 3), 0.5, jnp.float32)
  f = functools.partial(skip.sample_grid2d, grid_resolution=res,
                        outside_value=0.25)
  out_x = f(g2d, vpm, vsl, use_pallas=False)
  out_p = f(g2d, vpm, vsl, use_pallas=True)
  tt.assert_allclose(np.asarray(out_x), np.asarray(out_p), atol=1e-5)
  # The scene must actually exercise both masked paths.
  assert float(jnp.mean((out_p == 0.25).all(-1).astype(jnp.float32))) > 0.01

  ct = jnp.asarray(rng.standard_normal(out_x.shape), jnp.float32)
  gx = jax.grad(lambda g: (f(g, vpm, vsl, use_pallas=False) * ct).sum())(g2d)
  gp = jax.grad(lambda g: (f(g, vpm, vsl, use_pallas=True) * ct).sum())(g2d)
  tt.assert_allclose(np.asarray(gx), np.asarray(gp), rtol=1e-4, atol=1e-4)


def test_sample_grid2d_pallas_packed():
  rng = np.random.default_rng(3)
  b, res, c = 1, (8, 8, 8), 4
  h = w = 8
  g2d = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
  s = 2.4 / 8
  vpm = jnp.asarray(np.array([[[s, 0, 0, -1.1], [0, s, 0, -1.1],
                               [0, 0, 1.0 / 8, -0.1],
                               [0, 0, 0, 1.0]]], np.float32))
  vsl = jnp.full((b, 3), 0.5, jnp.float32)
  f = functools.partial(skip.sample_grid2d, grid_resolution=res, packed=True)
  out_x = f(g2d, vpm, vsl, use_pallas=False)
  out_p = f(g2d, vpm, vsl, use_pallas=True)
  tt.assert_allclose(np.asarray(out_x), np.asarray(out_p), atol=1e-5)
