"""Full-network forward parity against the REFERENCE torch model.

The strongest parity statement available without the real datasets: the
reference implementation at /root/reference (imported at runtime as an
oracle, never copied) is instantiated with RANDOM weights, its state_dict
is mapped through cli/import_corenet_checkpoint.convert_torch_state, and
the JAX forward on the converted weights must reproduce the torch forward
logits. This pins the entire composition — Caffe preprocessing, ResNet50
tap points, decoder stage algebra, ray-traced skips, BatchRenorm inference
statistics — not just each layer (tests/test_models.py) or the importer's
own key map (tests/test_import.py)."""

import os
import sys
import types

import numpy as np
import numpy.testing as tt
import jax
import jax.numpy as jnp
import pytest

REFERENCE_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_SRC),
    reason="reference implementation not available as an oracle")


def _import_reference_corenet():
  """Imports the reference torch model, stubbing its json-schema dep."""
  if "dataclasses_jsonschema" not in sys.modules:
    fake = types.ModuleType("dataclasses_jsonschema")
    fake.JsonSchemaMixin = type("JsonSchemaMixin", (), {})
    sys.modules["dataclasses_jsonschema"] = fake
  sys.path.insert(0, REFERENCE_SRC)
  try:
    from corenet import configuration as ref_configuration
    from corenet.model import core_net as ref_core_net
  finally:
    sys.path.remove(REFERENCE_SRC)
  return ref_configuration, ref_core_net


@pytest.mark.slow
def test_full_forward_matches_reference_torch():
  import torch

  ref_configuration, ref_core_net = _import_reference_corenet()
  resolution = (128, 128, 128)
  ref_cfg = ref_configuration.CoreNetConfig(
      decoder=ref_configuration.DecoderConfig(
          resolution=resolution, num_output_channels=2,
          last_upscale_factor=2, latent_channels=64, skip_fraction=0.75))
  torch.manual_seed(0)
  ref_model = ref_core_net.CoreNet(ref_cfg)

  # Randomize the BatchRenorm inference statistics too — defaults
  # (mean 0, var 1) would make the normalization a near no-op and mask
  # mapping errors in the running-stat entries.
  rng = np.random.default_rng(1)
  sd = ref_model.state_dict()
  for key, value in sd.items():
    if key.endswith("running_mean"):
      sd[key] = torch.from_numpy(
          rng.normal(0, 0.3, value.shape).astype(np.float32))
    elif key.endswith("running_var"):
      sd[key] = torch.from_numpy(
          rng.uniform(0.5, 2.0, value.shape).astype(np.float32))
  ref_model.load_state_dict(sd)
  ref_model.eval()

  batch = 1
  image_hw = 64
  image = rng.integers(0, 256, (batch, image_hw, image_hw, 3)).astype(
      np.uint8)
  # An affine voxel→NDC matrix that keeps most of the grid on-screen, so
  # the ray-traced skips sample in-bounds features (eye(4) would leave
  # them nearly all masked out).
  m = float(max(resolution))
  v2s = np.diag([1.8 / m, 1.8 / m, 1.8 / m, 1.0]).astype(np.float32)
  v2s[:3, 3] = -0.9
  v2s = np.broadcast_to(v2s, (batch, 4, 4)).copy()
  offsets = np.full((batch, 3), 0.5, np.float32)

  with torch.no_grad():
    ref_logits = ref_model(
        torch.from_numpy(image).permute(0, 3, 1, 2).contiguous(),
        torch.from_numpy(v2s), torch.from_numpy(offsets))
  ref_logits = ref_logits.numpy()  # [B, C, D, H, W]

  # Map the torch weights through the production converter.
  from corenet_tpu.cli.import_corenet_checkpoint import convert_torch_state
  from corenet_tpu.cli.import_resnet50_checkpoint import flat_tree_to_nested
  converted = convert_torch_state(
      {k: v.numpy() for k, v in ref_model.state_dict().items()})
  variables = flat_tree_to_nested(converted)
  variables = jax.tree_util.tree_map(jnp.asarray, variables)

  from corenet_tpu.models.corenet import (
      CoreNet, CoreNetConfig, DecoderConfig)
  model = CoreNet(CoreNetConfig(decoder=DecoderConfig(
      resolution=resolution, num_output_channels=2)))
  logits = jax.jit(lambda v, i, p, o: model.apply(v, i, p, o, train=False))(
      variables, jnp.asarray(image), jnp.asarray(v2s), jnp.asarray(offsets))
  logits = np.asarray(jax.device_get(logits))  # [B, D, H, W, C]

  got = np.transpose(logits, (0, 4, 1, 2, 3))
  assert got.shape == ref_logits.shape
  # f32 end-to-end but different conv/backend kernels: tolerances sized
  # for ~60 layers of accumulation.
  scale = np.abs(ref_logits).max()
  tt.assert_allclose(got, ref_logits, atol=2e-3 * scale, rtol=2e-3)
