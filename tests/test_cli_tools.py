"""Tests for the standalone CLI tools: launch (retry supervision),
preprocess_shapenet (OBJ → NPZ), and the demo (single-scene
reconstruction tile) — the reference entry points dist_launch.py,
preprocess_shapenet.py and corenet_demo.ipynb."""

import os

import numpy as np
import pytest


def test_launch_success_no_retry(tmp_path):
  from corenet_tpu.cli import launch
  rc = launch.main(["--num_retries=2", "--retry_wait_sec=0.01", "--",
                    "python", "-c", "pass"])
  assert rc == 0


def test_launch_retries_until_success(tmp_path):
  """Whole-job retry (reference dist_launch.py:67-105): first attempt
  fails, the relaunch succeeds."""
  from corenet_tpu.cli import launch
  marker = tmp_path / "attempted"
  script = (f"import os, sys; p = {str(marker)!r}\n"
            "if os.path.exists(p): sys.exit(0)\n"
            "open(p, 'w').close(); sys.exit(3)\n")
  rc = launch.main(["--num_retries=2", "--retry_wait_sec=0.01", "--",
                    "python", "-c", script])
  assert rc == 0
  assert marker.exists()


def test_launch_gives_up_after_retries():
  from corenet_tpu.cli import launch
  rc = launch.main(["--num_retries=1", "--retry_wait_sec=0.01", "--",
                    "python", "-c", "import sys; sys.exit(7)"])
  assert rc == 7


def test_preprocess_shapenet_obj_to_npz(tmp_path):
  """OBJ reading (fan triangulation, v/vt/vn face syntax), degenerate
  cleanup, and the <label>/<mesh_id>.npz layout."""
  from corenet_tpu.cli import preprocess_shapenet as pp
  mesh_dir = tmp_path / "snroot" / "04379243" / "mesh01" / "models"
  os.makedirs(mesh_dir)
  obj = "\n".join([
      "# comment",
      "v 0 0 0",
      "v 1 0 0",
      "v 1 1 0",
      "v 0 1 0",
      "v 0 0 0",          # duplicate of v1 → degenerate triangle below
      "f 1/1/1 2/2/2 3/3/3 4/4/4",  # quad → 2 triangles (fan)
      "f 1 2 5",          # zero-area (v5 == v1)
      "",
  ])
  (mesh_dir / "model_normalized.obj").write_text(obj)

  out = pp.process_mesh(str(mesh_dir / "model_normalized.obj"),
                        str(tmp_path / "out"))
  assert out.endswith(os.path.join("04379243", "mesh01.npz"))
  with np.load(out) as z:
    verts = z["vertices"]
    assert str(z["label"]) == "04379243"
    assert str(z["mesh_id"]) == "mesh01"
  # Quad fan → 2 triangles; the degenerate one removed.
  assert verts.shape == (2, 3, 3)
  np.testing.assert_array_equal(verts[0],
                                [[0, 0, 0], [1, 0, 0], [1, 1, 0]])
  np.testing.assert_array_equal(verts[1],
                                [[0, 0, 0], [1, 1, 0], [0, 1, 0]])


def test_preprocess_cleanup_zero_length_edge():
  from corenet_tpu.cli import preprocess_shapenet as pp
  tri_ok = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
  tri_line = np.array([[[0, 0, 0], [1, 0, 0], [2, 0, 0]]], np.float32)
  mesh = np.concatenate([tri_ok, tri_line])
  out = pp.cleanup_mesh(mesh)
  np.testing.assert_array_equal(out, tri_ok)


@pytest.mark.slow
def test_train_cli_then_demo(tmp_path):
  """The real user flow end to end: a JSON5 config file through the
  train CLI (which embeds full_config/classes in the checkpoint), then
  the demo CLI reconstructs one scene from that checkpoint into a PNG
  tile — covering cli/train.main and cli/demo.main as entry points."""
  import json
  from helpers import make_fixture_dataset
  from corenet_tpu.cli import demo, eval as eval_cli, train as train_cli
  from corenet_tpu.config import config_to_dict
  from corenet_tpu.config import TrainPipeline as TrainPipelineConfig
  from corenet_tpu.config.config import (
      TrainConfig, Dataset, DataPipeline, DataLoaderConfig, EvalConfig,
      RecurrentEvalConfig, ShuffleType, VoxelizationConfig, TaskType,
      Resolution)

  manifest, meshes_dir = make_fixture_dataset(str(tmp_path / "ds"),
                                              num_scenes=8, image_size=64)
  out = str(tmp_path / "out")

  def data_pipeline(batch_size):
    return DataPipeline(
        datasets=[Dataset(dataset_path=manifest, meshes_dir=meshes_dir,
                          high_realism=True, shuffle=ShuffleType.NEVER)],
        shuffle=ShuffleType.NEVER,
        data_loader=DataLoaderConfig(batch_size=batch_size,
                                     num_data_workers=0),
        voxelization_config=VoxelizationConfig(
            task_type=TaskType.SEMANTIC,
            resolution=Resolution(32, 32, 32),
            voxelization_image_resolution_multiplier=2))

  config = TrainPipelineConfig(
      string_templates=[],
      train=TrainConfig(
          # The default mesh spans all (8 virtual) devices: the batch
          # must divide the 'data' extent.
          data=data_pipeline(8),
          resnet50_imagenet_checkpoint="",
          checkpoint_interval=8,
          persistent_checkpoint_interval=1000,
          tensorboard_log_interval=100,
          initial_learning_rate=4e-4,
          max_steps=8),
      eval=[RecurrentEvalConfig(
          start_step=0, interval=10 ** 9, persistent_checkpoint=False,
          config=EvalConfig(name="cli_eval", data=data_pipeline(8)))],
      output_path=out)
  config_path = str(tmp_path / "config.json5")
  with open(config_path, "w") as f:
    json.dump(config_to_dict(config), f)

  train_cli.main([f"--config_path={config_path}"])

  cpt_dir = os.path.join(out, "cpt", "temp")
  cpts = sorted(os.listdir(cpt_dir))
  assert cpts, cpt_dir

  scene_npz = os.path.join(str(tmp_path / "ds"), "scenes", "scene_000.npz")
  png = str(tmp_path / "recon.png")
  demo.main([f"--scene={scene_npz}", f"--meshes_dir={meshes_dir}",
             f"--checkpoint={os.path.join(cpt_dir, cpts[-1])}",
             f"--output={png}", "--resolution=32"])
  import PIL.Image
  img = np.asarray(PIL.Image.open(png))
  assert img.ndim == 3 and img.shape[0] > 0 and img.shape[2] == 3

  # cli/eval: reconstruct configs from the checkpoint metadata, run the
  # matching recurrent eval, write voxel_metrics.csv.
  eval_out = str(tmp_path / "eval_out")
  eval_cli.main([f"--checkpoint_path={os.path.join(cpt_dir, cpts[-1])}",
                 f"--output_path={eval_out}",
                 "--eval_names_regex=cli_eval"])
  csv = os.path.join(eval_out, "cli_eval", "8", "voxel_metrics.csv")
  assert os.path.exists(csv), csv
