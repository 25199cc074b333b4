"""Mesh / sharding semantics on the virtual CPU mesh: the 'space' axis
spatially partitions the GT grid + decoder inside the train step, the
TrainPipeline wires its mesh into the step, and an abandoned loader epoch
does not leak its producer thread."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as tt
import pytest

from corenet_tpu.config import (
    DataLoaderConfig, DataPipeline, Dataset, Resolution, ShuffleType,
    TaskType, TrainConfig, VoxelizationConfig,
)
from corenet_tpu.models.corenet import CoreNet, CoreNetConfig, DecoderConfig
from corenet_tpu.parallel import mesh as mesh_lib
from corenet_tpu.train import state as state_lib
from corenet_tpu.train.step import make_train_step

from helpers import make_fixture_dataset

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs the virtual multi-device mesh")

RESOLUTION = (32, 32, 32)


def _model_and_state():
  model = CoreNet(CoreNetConfig(decoder=DecoderConfig(
      resolution=RESOLUTION, num_output_channels=2)))
  optimizer = state_lib.create_optimizer()
  image = jnp.zeros((1, 64, 64, 3), jnp.uint8)
  variables = jax.jit(lambda: model.init(
      jax.random.PRNGKey(0), image, jnp.eye(4)[None],
      jnp.full((1, 3), 0.5), train=False))()
  return model, optimizer, state_lib.create_train_state(variables, optimizer)


@pytest.mark.slow
def test_space_sharded_step_matches_unsharded():
  """SURVEY §5's spatial-partitioning analogue: same data axis, with and
  without a 'space' axis — the loss must be identical and the lowered
  program must actually carry the ('data', 'space') grid sharding."""
  from __graft_entry__ import _example_inputs
  model, optimizer, state = _model_and_state()
  inputs = _example_inputs(2, 64, RESOLUTION)

  losses = {}
  for space in (1, 2):
    mesh = mesh_lib.create_mesh(data=2, space=space,
                                devices=jax.devices()[:2 * space])
    with mesh:
      st = mesh_lib.replicate_tree(mesh, state)
      step = make_train_step(
          model, optimizer, "FG_BG", RESOLUTION,
          voxelization_kwargs=dict(image_resolution_multiplier=2,
                                   max_bbox_pixels=24),
          donate=False, mesh=mesh)
      batch = mesh_lib.shard_batch(mesh, inputs)
      if space > 1:
        hlo = step.lower(st, batch).as_text().replace(" ", "")
        # The int32[B, D, H, W] GT grid constrained to P('data','space')
        # (shardy annotation of with_sharding_constraint).
        assert ('sharding_constraint' in hlo and
                '[{"data"},{"space"},{},{}]' in hlo)
      new_state, metrics = step(st, batch)
      losses[space] = float(jax.device_get(metrics["loss"]))
      assert int(new_state.global_step) == 2
      assert np.isfinite(losses[space])
  tt.assert_allclose(losses[1], losses[2], rtol=1e-5)


def test_pipeline_wires_mesh_into_step(tmp_path, monkeypatch):
  from corenet_tpu.train import pipeline as pipeline_mod
  manifest, meshes_dir = make_fixture_dataset(str(tmp_path / "ds"),
                                              num_scenes=1)
  config = TrainConfig(
      data=DataPipeline(
          datasets=[Dataset(dataset_path=manifest, meshes_dir=meshes_dir,
                            high_realism=True, shuffle=ShuffleType.NEVER)],
          shuffle=ShuffleType.NEVER,
          data_loader=DataLoaderConfig(batch_size=4, num_data_workers=1),
          voxelization_config=VoxelizationConfig(
              task_type=TaskType.SEMANTIC,
              resolution=Resolution(*RESOLUTION))),
      resnet50_imagenet_checkpoint="")

  captured = {}

  def fake_make_train_step(*args, **kwargs):
    captured.update(kwargs)
    return lambda s, b: (s, {})

  monkeypatch.setattr(pipeline_mod, "make_train_step", fake_make_train_step)
  mesh = mesh_lib.create_mesh(data=4, space=2)
  pipeline_mod.TrainPipeline(config, str(tmp_path / "out"), mesh=mesh)
  assert captured.get("mesh") is mesh


def test_loader_process_workers_match_threads(tmp_path):
  """Process decode workers (spawn, GIL-free — the reference's fork-worker
  analogue, pipeline.py:102-123) produce byte-identical batches to thread
  workers."""
  from corenet_tpu.data.dataset import CoreNetDatasetImpl
  from corenet_tpu.data.loader import DataLoader
  manifest, meshes_dir = make_fixture_dataset(str(tmp_path / "ds"),
                                              num_scenes=4)
  ds = CoreNetDatasetImpl(manifest, meshes_dir)

  def batches(worker_processes):
    loader = DataLoader(ds, batch_size=2, num_workers=2, prefetch_factor=1,
                        worker_processes=worker_processes)
    return list(loader)

  got_p = batches(True)
  got_t = batches(False)
  assert len(got_p) == len(got_t) == 2
  for (hp, vp), (ht, vt) in zip(got_p, got_t):
    assert hp.scene_ids == ht.scene_ids
    np.testing.assert_array_equal(hp.image, ht.image)
    np.testing.assert_array_equal(hp.triangles, ht.triangles)
    np.testing.assert_array_equal(hp.mesh_labels, ht.mesh_labels)
    np.testing.assert_array_equal(vp, vt)


def test_loader_abandoned_epoch_releases_producer(tmp_path):
  from corenet_tpu.data.dataset import CoreNetDatasetImpl
  from corenet_tpu.data.loader import DataLoader
  manifest, meshes_dir = make_fixture_dataset(str(tmp_path / "ds"),
                                              num_scenes=8)
  ds = CoreNetDatasetImpl(manifest, meshes_dir)
  loader = DataLoader(ds, batch_size=1, num_workers=1, prefetch_factor=1)

  before = threading.active_count()
  it = iter(loader)
  next(it)  # producer is now blocked on a full queue
  it.close()  # abandons the epoch (the max_steps exit path)

  deadline = time.time() + 15
  while threading.active_count() > before and time.time() < deadline:
    time.sleep(0.05)
  assert threading.active_count() <= before, (
      "loader producer thread leaked after abandoning the epoch")
