"""Checkpoint importer tests: Keras h5 naming and torch CoreNet mapping.

The torch test builds a synthetic reference state_dict (reference module
naming + torch tensor layouts) by inverting the documented mapping, runs
the converter, merges into a freshly initialized model, and asserts every
parameter round-trips — double-entry bookkeeping for the layout math."""

import io

import numpy as np
import numpy.testing as tt
import jax
import jax.numpy as jnp
import pytest

from corenet_tpu.cli.import_corenet_checkpoint import convert_torch_state
from corenet_tpu.cli.import_resnet50_checkpoint import (
    flat_tree_to_nested, load_encoder_variables)
from corenet_tpu.models.corenet import CoreNet, CoreNetConfig, DecoderConfig


def _torch_key_and_layout(flat_key: str):
  """Inverse mapping: our flat key → (torch key, transpose-to-torch)."""
  coll, *path = flat_key.split("/")
  name = path[-1]
  mod = "/".join(path[:-1])

  def bn(torch_mod):
    suffix = {"scale": "weight", "bias": "bias", "mean": "running_mean",
              "var": "running_var", "steps": "num_batches_tracked"}[name]
    return f"{torch_mod}.{suffix}", None

  if mod == "encoder/stage1_conv":
    return f"encoder.stage1.conv.{name_t(name)}", (3, 2, 0, 1)
  if mod == "encoder/stage1_bn":
    return bn("encoder.stage1_part2.bn")
  if mod.startswith("encoder/stage"):
    stage, block = mod[len("encoder/stage")], mod[len("encoder/stage") + 1]
    kind = path[-2].split("_", 1)  # conv_a / bn_shortcut ...
    op = {"a": "op_a", "b": "op_b", "c": "op_c",
          "shortcut": "shortcut"}[kind[1]]
    base = f"encoder.stage{stage}.{block}.{op}"
    if kind[0] == "bn":
      return bn(f"{base}.bn")
    return f"{base}.conv.{name_t(name)}", (3, 2, 0, 1)
  if mod == "decoder/stage_0":
    return f"decoder.stage_0.{name_t(name)}", (1, 0)
  if mod.startswith("decoder/rt_skip_"):
    stage = mod.split("/")[1].rsplit("_", 1)[-1]
    return (f"decoder.rt_skip_{stage}.compress_channels.{name_t(name)}",
            (3, 2, 0, 1))
  if mod.startswith("decoder/stage_"):
    rest = path[-2]  # stage_N_bn1 / stage_N_c / stage_N_t ...
    stage = rest.split("_")[1]
    kind = rest.split("_", 2)[2]
    if kind in ("bn1", "bn2"):
      return bn(f"decoder.stage_{stage}.b{kind[-1]}")
    if kind == "bn":  # stage_1_bn
      return bn(f"decoder.stage_{stage}.b1")
    if kind == "c":
      return f"decoder.stage_{stage}.c1.{name_t(name)}", (4, 3, 0, 1, 2)
    if kind == "t":
      # torch ConvTranspose3d [I, O, kd, kh, kw] ← DHWIO by (3, 4, 0, 1, 2)
      return f"decoder.stage_{stage}.t1.{name_t(name)}", (3, 4, 0, 1, 2)
  raise KeyError(flat_key)


def name_t(name):
  return {"kernel": "weight", "bias": "bias"}[name]


def _flatten(tree, prefix=""):
  out = {}
  for k, v in tree.items():
    key = f"{prefix}/{k}" if prefix else k
    if isinstance(v, dict):
      out.update(_flatten(v, key))
    else:
      out[key] = np.asarray(v)
  return out


@pytest.mark.slow
def test_torch_corenet_import_roundtrip():
  cfg = CoreNetConfig(decoder=DecoderConfig(resolution=(128, 128, 128),
                                            num_output_channels=2))
  model = CoreNet(cfg)
  variables = jax.jit(lambda: model.init(
      jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.uint8),
      jnp.eye(4)[None], jnp.full((1, 3), 0.5), train=False))()

  flat = {}
  for coll in ("params", "batch_stats"):
    flat.update(_flatten({coll: jax.device_get(variables[coll])}))

  # Build the synthetic torch state dict with fresh random values.
  rng = np.random.default_rng(0)
  torch_state, expected = {}, {}
  for key, value in flat.items():
    tkey, transpose = _torch_key_and_layout(key)
    fresh = rng.standard_normal(value.shape).astype(np.float32) \
        if value.ndim else np.asarray(7, np.int64)
    expected[key] = fresh
    torch_state[tkey] = (np.transpose(fresh, transpose)
                         if transpose and fresh.ndim == len(transpose)
                         else fresh)

  converted = convert_torch_state(torch_state)
  # Converter covers exactly the parameter set.
  assert set(converted.keys()) == set(flat.keys())
  for key in flat:
    got = converted[key]
    tt.assert_allclose(np.asarray(got, np.float32),
                       np.asarray(expected[key], np.float32), rtol=1e-6,
                       err_msg=key)

  # Strict shape-checked merge into the model accepts it.
  buf = io.BytesIO()
  np.savez(buf, **converted)
  path = "/tmp/converted_test.npz"
  open(path, "wb").write(buf.getvalue())
  merged = load_encoder_variables(variables, path)
  tt.assert_allclose(
      np.asarray(merged["params"]["decoder"]["stage_0"]["kernel"]),
      expected["params/decoder/stage_0/kernel"])
