"""Checkpoint-container seam (VERDICT r4 #5): the EXACT bytes format a
released reference checkpoint has — `reference.state.encode_state()`'s
torch.save container with global_step / model_state / model_config /
optimizer_state / extra_metadata — flows through the real
`cli/import_corenet_checkpoint` entry point, and the imported .cpt
evaluates through `cli/eval`.

The prior round-trip test (test_import.py) builds its own synthetic
state_dict; this one produces the container with the reference's own
encoder (reference state.py:73-82, torch available as an oracle)."""

import io
import json
import os
import sys
import types

import numpy as np
import pytest

REFERENCE_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_SRC),
    reason="reference implementation not available as an oracle")


def _import_reference(*names):
  """Imports reference modules with the json-schema dep stubbed richly
  enough for state.encode_state (config.to_dict)."""
  import dataclasses
  if "dataclasses_jsonschema" not in sys.modules:
    fake = types.ModuleType("dataclasses_jsonschema")

    class JsonSchemaMixin:
      def to_dict(self):
        return dataclasses.asdict(self)

    fake.JsonSchemaMixin = JsonSchemaMixin
    sys.modules["dataclasses_jsonschema"] = fake
  else:
    mixin = sys.modules["dataclasses_jsonschema"].JsonSchemaMixin
    if not hasattr(mixin, "to_dict"):
      mixin.to_dict = lambda self: dataclasses.asdict(self)
  sys.path.insert(0, REFERENCE_SRC)
  try:
    out = []
    import importlib
    for name in names:
      out.append(importlib.import_module(name))
    return out
  finally:
    sys.path.remove(REFERENCE_SRC)


@pytest.mark.slow
def test_reference_encode_state_through_import_cli(tmp_path):
  import torch

  (ref_configuration,) = _import_reference("corenet.configuration")
  (ref_core_net,) = _import_reference("corenet.model.core_net")
  (ref_state_lib,) = _import_reference("corenet.state")

  # --- a real reference State: model + Adam with non-trivial moments ---
  resolution = (128, 128, 128)
  ref_cfg = ref_configuration.CoreNetConfig(
      decoder=ref_configuration.DecoderConfig(
          resolution=resolution, num_output_channels=2,
          last_upscale_factor=2, latent_channels=64, skip_fraction=0.75))
  torch.manual_seed(0)
  ref_model = ref_core_net.CoreNet(ref_cfg)
  optimizer = torch.optim.Adam(ref_model.parameters(), lr=4e-4, eps=1e-4)
  # One cheap optimizer step so optimizer_state carries real Adam
  # moments (a released checkpoint always does).
  loss = sum(p.sum() for p in ref_model.parameters())
  loss.backward()
  optimizer.step()

  ref_state = ref_state_lib.State(
      global_step=123456, model=ref_model, optimizer=optimizer,
      extra_metadata={"original": "train_config"})
  blob = ref_state_lib.encode_state(ref_state)

  # The container really is the reference format.
  decoded = torch.load(io.BytesIO(blob), map_location="cpu",
                       weights_only=False)
  assert set(decoded.keys()) == {"global_step", "model_state",
                                 "model_config", "optimizer_state",
                                 "extra_metadata"}
  torch_cpt = str(tmp_path / "reference_h5.cpt")
  with open(torch_cpt, "wb") as f:
    f.write(blob)

  # --- a matching train config over a fixture dataset (h5-style FG_BG
  # 128-cube) for the importer to embed ---
  from helpers import make_fixture_dataset
  from corenet_tpu.config import TrainPipeline as TrainPipelineConfig
  from corenet_tpu.config import config_to_dict
  from corenet_tpu.config.config import (
      DataLoaderConfig, DataPipeline, Dataset, EvalConfig,
      RecurrentEvalConfig, Resolution, ShuffleType, TaskType, TrainConfig,
      VoxelizationConfig)

  manifest, meshes_dir = make_fixture_dataset(str(tmp_path / "ds"),
                                              num_scenes=2, image_size=64)

  def data_pipeline():
    return DataPipeline(
        datasets=[Dataset(dataset_path=manifest, meshes_dir=meshes_dir,
                          high_realism=True, shuffle=ShuffleType.NEVER)],
        shuffle=ShuffleType.NEVER,
        data_loader=DataLoaderConfig(batch_size=1, num_data_workers=0),
        voxelization_config=VoxelizationConfig(
            task_type=TaskType.FG_BG,
            resolution=Resolution(128, 128, 128),
            voxelization_image_resolution_multiplier=8))

  config = TrainPipelineConfig(
      string_templates=[],
      train=TrainConfig(data=data_pipeline(),
                        resnet50_imagenet_checkpoint="",
                        initial_learning_rate=4e-4,
                        skip_fraction=0.75, latent_channels=64,
                        last_upscale_factor=2, max_steps=1),
      eval=[RecurrentEvalConfig(
          start_step=0, interval=10 ** 9, persistent_checkpoint=False,
          config=EvalConfig(name="seam_eval", data=data_pipeline()))],
      output_path=str(tmp_path / "out"))
  config_path = str(tmp_path / "h5_seam.json5")
  with open(config_path, "w") as f:
    json.dump(config_to_dict(config), f)

  # --- the real CLI: torch .cpt → native .cpt ---
  from corenet_tpu.cli import import_corenet_checkpoint as import_cli
  native_cpt = str(tmp_path / "imported.cpt")
  import_cli.main([f"--torch_checkpoint={torch_cpt}",
                   f"--train_config={config_path}",
                   f"--output_path={native_cpt}"])
  assert os.path.exists(native_cpt)

  # The imported state preserves the step and the tensor values.
  from corenet_tpu.train import checkpoint as cpt_lib
  raw, extra = cpt_lib.decode_state(open(native_cpt, "rb").read())
  assert extra["imported_from"] == torch_cpt
  assert int(raw.global_step) == 123456
  np.testing.assert_allclose(
      np.asarray(raw.params["decoder"]["stage_0"]["kernel"]),
      ref_model.decoder.stage_0.weight.detach().numpy().T, rtol=1e-6)

  # --- and the imported checkpoint actually evaluates (cli/eval) ---
  from corenet_tpu.cli import eval as eval_cli
  eval_out = str(tmp_path / "eval_out")
  results = eval_cli.main([f"--checkpoint_path={native_cpt}",
                           f"--output_path={eval_out}",
                           "--eval_names_regex=seam_eval",
                           "--max_scenes=1"])
  assert "seam_eval" in results
  csv = os.path.join(eval_out, "seam_eval", "123456", "voxel_metrics.csv")
  assert os.path.exists(csv), csv
