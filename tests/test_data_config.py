"""Data pipeline + config system tests."""

import json
import os

import numpy as np
import numpy.testing as tt
import pytest

from corenet_tpu.config import (
    DataLoaderConfig, DataPipeline, Dataset, Resolution, ShuffleType,
    TaskType, TrainConfig, TrainPipeline, VoxelizationConfig,
    config_from_dict, config_to_dict, parse_template_mapping,
    post_process_config, apply_set_overrides, replace_templates,
)
from corenet_tpu.config.config import StringTemplate
from corenet_tpu.data import batching
from corenet_tpu.data.dataset import CoreNetDataset, CoreNetDatasetImpl, concatenate
from corenet_tpu.data.manager import DatasetManager

from helpers import make_fixture_dataset


@pytest.fixture(scope="module")
def fixture_ds(tmp_path_factory):
  root = tmp_path_factory.mktemp("ds")
  return make_fixture_dataset(str(root), num_scenes=6)


def test_dataset_classes_and_elements(fixture_ds):
  manifest, meshes_dir = fixture_ds
  ds = CoreNetDatasetImpl(manifest, meshes_dir)
  assert ds.classes[0] == "__void__"
  assert list(ds.classes[1:]) == sorted(ds.classes[1:])
  assert len(ds) == 6
  el = ds[0]
  assert el.mesh_vertices.shape[1:] == (3, 3)
  assert el.input_image.dtype == np.uint8
  assert el.mesh_labels.min() >= 1  # 0 reserved for void
  assert el.mesh_num_tri.sum() == el.mesh_vertices.shape[0]


def test_virtual_dataset_ops(fixture_ds):
  manifest, meshes_dir = fixture_ds
  impl = CoreNetDatasetImpl(manifest, meshes_dir)
  ds = CoreNetDataset(impl, impl.classes)
  half = ds.take_fraction(0, 0.5)
  assert len(half) == 3
  sh1 = ds.shuffle(7)
  sh2 = ds.shuffle(7)
  tt.assert_array_equal(sh1.indices, sh2.indices)
  assert not np.array_equal(ds.shuffle(8).indices, sh1.indices)
  cat = concatenate([half, half])
  assert len(cat) == 6
  assert cat[0].scene_id == half[0].scene_id


def test_dataset_manager_epochs(fixture_ds):
  manifest, meshes_dir = fixture_ds
  dp = DataPipeline(
      datasets=[Dataset(dataset_path=manifest, meshes_dir=meshes_dir,
                        high_realism=True, shuffle=ShuffleType.PER_EPOCH)],
      shuffle=ShuffleType.PER_EPOCH,
      data_loader=DataLoaderConfig(batch_size=2),
      voxelization_config=VoxelizationConfig(
          task_type=TaskType.SEMANTIC,
          resolution=Resolution(32, 32, 32)))
  mgr = DatasetManager(dp)
  assert mgr.epoch_len == 6
  # Epoch shuffles differ; resume mid-epoch slices deterministically.
  e0 = mgr.create_dataset(local_seed=0)
  e1 = mgr.create_dataset(local_seed=1)
  assert not np.array_equal(e0.indices, e1.indices)
  resumed = mgr.create_dataset_from_start_step(8)  # epoch 1, offset 2
  tt.assert_array_equal(resumed.indices, e1.indices[2:])


def test_batching_and_subdivision(fixture_ds):
  manifest, meshes_dir = fixture_ds
  impl = CoreNetDatasetImpl(manifest, meshes_dir)
  els = [impl[i] for i in range(3)]
  hb = batching.batch(els, max_edge_view=0.1)
  b, t = hb.triangles.shape[:2]
  assert b == 3 and (t & (t - 1)) == 0  # power-of-two bucket
  assert hb.tri_valid.any(axis=1).all()
  # Subdivision: all valid edges ≤ 0.1.
  tris = hb.triangles[hb.tri_valid]
  e = np.stack([tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 1],
                tris[:, 0] - tris[:, 2]], 1)
  assert np.linalg.norm(e, axis=2).max() <= 0.1 + 1e-6
  # step_inputs per task
  si = hb.step_inputs("FG_BG")
  assert set(np.unique(si["mesh_labels"])) <= {0, 1}
  si = hb.step_inputs("SEMANTIC")
  assert si["mesh_labels"].max() >= 1


def test_config_roundtrip_and_templates():
  tp = TrainPipeline(
      string_templates=[StringTemplate(key="data_dir", value="/data")],
      train=TrainConfig(
          data=DataPipeline(
              datasets=[Dataset(dataset_path="{data_dir}/ds.json",
                                meshes_dir="{data_dir}/meshes")],
              shuffle=ShuffleType.ONCE,
              data_loader=DataLoaderConfig(),
              voxelization_config=VoxelizationConfig(
                  task_type=TaskType.FG_BG,
                  resolution=Resolution(128, 128, 128))),
          resnet50_imagenet_checkpoint="{data_dir}/r50.cpt"),
      eval=[],
      output_path="{out_dir}/run1")

  d = config_to_dict(tp)
  s = json.dumps(d)  # must be JSON-serializable
  tp2 = config_from_dict(TrainPipeline, json.loads(s))
  assert tp2 == tp

  values = parse_template_mapping(["out_dir=/out"])
  resolved = replace_templates(tp2, values)
  assert resolved.output_path == "/out/run1"
  assert resolved.train.data.datasets[0].dataset_path == "/data/ds.json"
  assert values["data_dir"] == "/data"  # registered by StringTemplate

  # -D overrides beat StringTemplate defaults.
  values = parse_template_mapping(["out_dir=/out", "data_dir=/other"])
  resolved = replace_templates(tp2, values)
  assert resolved.train.data.datasets[0].dataset_path == "/other/ds.json"


def test_set_overrides():
  d = {"a": {"b": [1, 2, {"c": "x"}]}}
  apply_set_overrides(d, ["a.b.2.c=42", "a.b.0=7"])
  assert d["a"]["b"][2]["c"] == 42 and d["a"]["b"][0] == 7


def test_post_process_config_full_chain():
  d = {
      "string_templates": [{"key": "root", "value": "/r"}],
      "train": {
          "data": {
              "datasets": [{"dataset_path": "{root}/d.json",
                            "meshes_dir": "{root}/m"}],
              "shuffle": "PER_EPOCH",
              "data_loader": {"batch_size": 8},
              "voxelization_config": {
                  "task_type": "FG_BG",
                  "resolution": {"depth": 128, "height": 128, "width": 128},
              },
          },
          "resnet50_imagenet_checkpoint": "{root}/r50",
      },
      "eval": [],
      "output_path": "{root}/out",
  }
  tp = post_process_config(
      d, TrainPipeline, set_overrides=["train.data.data_loader.batch_size=16"])
  assert tp.train.data.data_loader.batch_size == 16
  assert tp.output_path == "/r/out"
  assert tp.train.data.voxelization_config.resolution.as_tuple() == (128,) * 3
  assert tp.train.data.voxelization_config.task_type == TaskType.FG_BG


def test_generated_configs_match_checked_in(tmp_path):
  """configs/ is generator output — the generator is the source of truth
  for the reproduction values (reference generate_configs.py), so any
  scaffolding refactor or config-field change must regenerate it."""
  import filecmp
  import os
  from corenet_tpu.cli import generate_configs
  generate_configs.main(["--output_dir", str(tmp_path)])
  repo_configs = os.path.join(os.path.dirname(__file__), "..", "configs")
  for sub in ("models", "paper_tf_models", "schemas"):
    ref_dir = os.path.join(repo_configs, sub)
    names = sorted(os.listdir(ref_dir))
    assert names == sorted(os.listdir(tmp_path / sub))
    _, mismatch, errors = filecmp.cmpfiles(
        ref_dir, tmp_path / sub, names, shallow=False)
    assert not mismatch and not errors, (sub, mismatch, errors)
