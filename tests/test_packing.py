"""Packed (space-to-depth) conv execution must equal the fine-grid ops."""

import numpy as np
import numpy.testing as tt
import jax
import jax.numpy as jnp
import pytest

from corenet_tpu.models import layers, packing


def test_space_depth_roundtrip():
  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.random((2, 4, 6, 8, 3)).astype(np.float32))
  packed = packing.space_to_depth(x)
  assert packed.shape == (2, 2, 3, 4, 24)
  tt.assert_array_equal(np.asarray(packing.depth_to_space(packed, 3)),
                        np.asarray(x))
  # Phase-major layout: packed channel (pz,py,px,c).
  tt.assert_array_equal(np.asarray(packed[0, 0, 0, 0, :3]),
                        np.asarray(x[0, 0, 0, 0]))
  tt.assert_array_equal(np.asarray(packed[0, 0, 0, 0, 3:6]),
                        np.asarray(x[0, 0, 0, 1]))  # px=1 block
  tt.assert_array_equal(np.asarray(packed[0, 0, 0, 0, 12:15]),
                        np.asarray(x[0, 1, 0, 0]))  # pz=1 block


@pytest.mark.parametrize("k", [3, 5])
def test_packed_conv_matches_fine(k):
  rng = np.random.default_rng(k)
  cin, cout = 3, 4
  x = jnp.asarray(rng.random((2, 8, 8, 8, cin)).astype(np.float32))
  kernel = jnp.asarray(
      rng.random((k, k, k, cin, cout)).astype(np.float32) - 0.5)

  dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                      ("NDHWC", "DHWIO", "NDHWC"))
  fine = jax.lax.conv_general_dilated(
      x, kernel, (1, 1, 1), [(k // 2, k // 2)] * 3, dimension_numbers=dn)

  packed = packing.packed_conv(packing.space_to_depth(x), kernel, k // 2)
  out = packing.depth_to_space(packed, cout)
  tt.assert_allclose(np.asarray(out), np.asarray(fine), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("k,p,op", [(7, 3, 1), (3, 1, 1)])
def test_packed_conv_transpose_matches_fine(k, p, op):
  rng = np.random.default_rng(k)
  cin, cout = 3, 2
  x = jnp.asarray(rng.random((1, 8, 8, 8, cin)).astype(np.float32))
  m = layers.ConvTranspose(features=cout, kernel_size=k, ndim=3, stride=2,
                           padding=p, output_padding=op, use_bias=False)
  params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
  fine = jax.jit(m.apply)(params, x)
  kernel = params["params"]["kernel"]

  packed = packing.packed_conv_transpose(
      packing.space_to_depth(x), kernel, 2, p, op)
  assert packed.shape == (1, 8, 8, 8, 8 * cout)
  out = packing.depth_to_space(packed, cout)
  assert out.shape == fine.shape
  tt.assert_allclose(np.asarray(out), np.asarray(fine), rtol=2e-4,
                     atol=2e-5)


def test_packed_conv_block_input_groups():
  """Block layout [8·ga | 8·gb] + input_groups == interleaved packed conv.

  This is the skip-concat contract: a plain lane concat of two
  phase-major packed tensors, consumed by a conv whose kernel expansion
  reorders to match (packing.packed_conv input_groups)."""
  rng = np.random.default_rng(7)
  ga, gb, cout, k = 3, 2, 4, 5
  a = jnp.asarray(rng.random((2, 4, 4, 4, 8 * ga)).astype(np.float32))
  b = jnp.asarray(rng.random((2, 4, 4, 4, 8 * gb)).astype(np.float32))
  kernel = jnp.asarray(
      rng.random((k, k, k, ga + gb, cout)).astype(np.float32) - 0.5)

  # Reference: interleave the blocks per phase, plain packed conv.
  sp = a.shape[:-1]
  inter = jnp.concatenate(
      [a.reshape(sp + (8, ga)), b.reshape(sp + (8, gb))],
      axis=-1).reshape(sp + (8 * (ga + gb),))
  want = packing.packed_conv(inter, kernel, k // 2)

  got = packing.packed_conv(jnp.concatenate([a, b], axis=-1), kernel,
                            k // 2, input_groups=(ga, gb))
  tt.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                     atol=2e-5)


def test_batch_renorm_phase_groups_matches_interleaved():
  from corenet_tpu.models.batch_renorm import BatchRenorm
  rng = np.random.default_rng(3)
  ga, gb = 3, 2
  a = jnp.asarray(rng.random((2, 4, 4, 4, 8 * ga)).astype(np.float32))
  b = jnp.asarray(rng.random((2, 4, 4, 4, 8 * gb)).astype(np.float32))
  sp = a.shape[:-1]
  inter = jnp.concatenate(
      [a.reshape(sp + (8, ga)), b.reshape(sp + (8, gb))],
      axis=-1).reshape(sp + (8 * (ga + gb),))
  blocked = jnp.concatenate([a, b], axis=-1)

  m_i = BatchRenorm(phase_packing=8)
  m_g = BatchRenorm(phase_packing=8, phase_groups=(ga, gb))
  params = m_i.init(jax.random.PRNGKey(0), inter, True)
  want, vs_i = m_i.apply(params, inter, True, mutable=["batch_stats"])
  got, vs_g = m_g.apply(params, blocked, True, mutable=["batch_stats"])
  # Outputs match after re-interleaving the blocked result.
  got_i = jnp.concatenate(
      [got[..., :8 * ga].reshape(sp + (8, ga)),
       got[..., 8 * ga:].reshape(sp + (8, gb))],
      axis=-1).reshape(sp + (8 * (ga + gb),))
  tt.assert_allclose(np.asarray(got_i), np.asarray(want), rtol=1e-5,
                     atol=1e-6)
  # Running statistics (per fine channel) match too.
  tt.assert_allclose(
      np.asarray(vs_g["batch_stats"]["mean"]),
      np.asarray(vs_i["batch_stats"]["mean"]), rtol=1e-6, atol=1e-7)
  tt.assert_allclose(
      np.asarray(vs_g["batch_stats"]["var"]),
      np.asarray(vs_i["batch_stats"]["var"]), rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("pfs", [2, 4, 5, 6])
def test_packed_decoder_matches_unpacked(pfs):
  """Full decoder: packed execution must equal the fine-grid execution
  with identical parameters (128³ would be slow on CPU; 64³ exercises
  every packed op: ir=(2,2,2) even seed). pack_from_stage variants run
  the leading towers fine and pack at stage pfs."""
  from corenet_tpu.models.corenet import CoreNet, CoreNetConfig, DecoderConfig
  import functools

  cfg = CoreNetConfig(decoder=DecoderConfig(resolution=(64, 64, 64),
                                            num_output_channels=2))
  rng = np.random.default_rng(7)
  image = jnp.asarray((rng.random((1, 64, 64, 3)) * 255).astype(np.uint8))
  proj = np.eye(4, dtype=np.float32)[None].copy()
  proj[:, 0, 0] = proj[:, 1, 1] = 1 / 32.0
  proj[:, 0, 3] = proj[:, 1, 3] = -1
  proj = jnp.asarray(proj)
  loc = jnp.full((1, 3), 0.5, jnp.float32)

  base = CoreNet(cfg)
  packed = CoreNet(cfg, packed_decoder=True, pack_from_stage=pfs)
  variables = jax.jit(functools.partial(base.init, train=False))(
      jax.random.PRNGKey(0), image, proj, loc)
  out_base = jax.jit(functools.partial(base.apply, train=False))(
      variables, image, proj, loc)
  out_packed = jax.jit(functools.partial(packed.apply, train=False))(
      variables, image, proj, loc)
  assert out_packed.shape == out_base.shape
  tt.assert_allclose(np.asarray(out_packed), np.asarray(out_base),
                     rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_packed_decoder_grads_match_unpacked():
  """Training equivalence: d(loss)/d(params) of the packed execution
  (pfs=5 default, exercising the blocked skip concat + group-aware
  conv/renorm) must match the fine execution with the same parameters."""
  from corenet_tpu.models.corenet import CoreNet, CoreNetConfig, DecoderConfig
  import functools

  cfg = CoreNetConfig(decoder=DecoderConfig(resolution=(64, 64, 64),
                                            num_output_channels=2))
  rng = np.random.default_rng(11)
  image = jnp.asarray((rng.random((1, 64, 64, 3)) * 255).astype(np.uint8))
  proj = np.eye(4, dtype=np.float32)[None].copy()
  proj[:, 0, 0] = proj[:, 1, 1] = 1 / 32.0
  proj[:, 0, 3] = proj[:, 1, 3] = -1
  proj = jnp.asarray(proj)
  loc = jnp.full((1, 3), 0.5, jnp.float32)
  tgt = jnp.asarray(
      (rng.random((1, 64, 64, 64, 2)) > 0.7).astype(np.float32))

  base = CoreNet(cfg)
  packed = CoreNet(cfg, packed_decoder=True)  # pack_from_stage default
  variables = jax.jit(functools.partial(base.init, train=False))(
      jax.random.PRNGKey(0), image, proj, loc)

  def loss(params, model):
    out = model.apply({**variables, "params": params}, image, proj, loc,
                      train=False)
    return jnp.mean((out - tgt) ** 2)

  g_base = jax.jit(jax.grad(functools.partial(loss, model=base)))(
      variables["params"])
  g_packed = jax.jit(jax.grad(functools.partial(loss, model=packed)))(
      variables["params"])
  flat_b = jax.tree_util.tree_leaves_with_path(g_base)
  flat_p = dict(jax.tree_util.tree_leaves_with_path(g_packed))
  # Identical trees; every leaf gradient matches to fp tolerance.
  assert set(flat_p) == {k for k, _ in flat_b}
  for key, vb in flat_b:
    vp = flat_p[key]
    scale = max(np.abs(np.asarray(vb)).max(), 1e-6)
    tt.assert_allclose(np.asarray(vp) / scale, np.asarray(vb) / scale,
                       rtol=0, atol=5e-3,
                       err_msg=jax.tree_util.keystr(key))


def test_conv_transpose_phase_output_matches_interleaved():
  """ConvTranspose(phase_output=True) must equal the normal output after
  a depth-to-space interleave (it is the same conv minus the reshuffle,
  so the match is exact)."""
  rng = np.random.default_rng(17)
  x = jnp.asarray(rng.random((2, 6, 6, 6, 5)).astype(np.float32))
  kw = dict(features=3, kernel_size=7, ndim=3, stride=2, padding=3,
            output_padding=1)
  m0 = layers.ConvTranspose(**kw)
  m1 = layers.ConvTranspose(**kw, phase_output=True)
  params = jax.jit(m0.init)(jax.random.PRNGKey(0), x)
  fine = jax.jit(m0.apply)(params, x)
  phased = jax.jit(m1.apply)(params, x)
  assert phased.shape == (2, 6, 6, 6, 8 * 3)
  tt.assert_array_equal(np.asarray(packing.depth_to_space(phased, 3)),
                        np.asarray(fine))


def test_packed_conv_transpose_phase_output_matches():
  """packed_conv_transpose(phase_output=True) returns the raw conv
  output; interleaving rm into space must reproduce the normal result
  exactly (it is literally the skipped code)."""
  rng = np.random.default_rng(23)
  cin, cout = 3, 2
  x = jnp.asarray(rng.random((1, 4, 4, 4, 8 * cin)).astype(np.float32))
  kernel = jnp.asarray(
      rng.random((7, 7, 7, cin, cout)).astype(np.float32) - 0.5)
  normal = packing.packed_conv_transpose(x, kernel, 2, 3, 1)
  raw = packing.packed_conv_transpose(x, kernel, 2, 3, 1,
                                      phase_output=True)
  b, j0, j1, j2, pc = raw.shape
  assert pc == 64 * cout
  y = raw.reshape(b, j0, j1, j2, 2, 2, 2, 8 * cout)
  y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7))
  y = y.reshape(b, 2 * j0, 2 * j1, 2 * j2, 8 * cout)
  tt.assert_array_equal(np.asarray(y), np.asarray(normal))


def test_super_resolution_packed_execution_matches_unpacked():
  """The inference factory's packed-execution twin (default on) must
  accept the UNPACKED model's variable tree unchanged and produce the
  same PMFs as packed_execution=False. Run at native 32³ — the y1
  configuration — which also proves the packing point is even there
  (decoder.py pack_sp check, ir=(1,1,1))."""
  import functools
  from corenet_tpu.eval.super_resolution import super_resolution_from_model
  from corenet_tpu.models.corenet import CoreNet, CoreNetConfig, DecoderConfig

  res = (32, 32, 32)
  model = CoreNet(CoreNetConfig(decoder=DecoderConfig(
      resolution=res, num_output_channels=2)))
  rng = np.random.default_rng(11)
  image = jnp.asarray((rng.random((1, 64, 64, 3)) * 255).astype(np.uint8))
  camera = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (1, 4, 4))
  v2x = jnp.broadcast_to(
      jnp.diag(jnp.array([32.0, 32.0, 32.0, 1.0], jnp.float32)), (1, 4, 4))
  offsets = jnp.full((1, 3), 0.5, jnp.float32)
  variables = jax.jit(functools.partial(model.init, train=False))(
      jax.random.PRNGKey(3), image, camera, offsets)

  sri_packed = super_resolution_from_model(model, variables, res)
  sri_fine = super_resolution_from_model(model, variables, res,
                                         packed_execution=False)
  pmf_packed = sri_packed(image, camera, v2x, offsets, res)
  pmf_fine = sri_fine(image, camera, v2x, offsets, res)
  assert pmf_packed.shape == (1, 32, 32, 32, 2)
  tt.assert_allclose(np.asarray(pmf_packed), np.asarray(pmf_fine),
                     rtol=2e-3, atol=2e-4)
