"""Checkpoint, super-resolution, and end-to-end train/eval smoke tests.

The reference has NO integration tests (SURVEY §4); these cover the gap:
checkpoint tiers + resume round-trip, the super-resolution interleave
layout, and a tiny end-to-end train → checkpoint → resume → eval run on a
synthetic fixture dataset.
"""

import os

import numpy as np
import numpy.testing as tt
import jax
import jax.numpy as jnp
import pytest

from corenet_tpu.config import (
    DataLoaderConfig, DataPipeline, Dataset, EvalConfig, RecurrentEvalConfig,
    Resolution, ShuffleType, TaskType, TrainConfig, VoxelizationConfig,
)
from corenet_tpu.eval.super_resolution import SuperResolutionInference
from corenet_tpu.train import checkpoint as cpt_lib
from corenet_tpu.train import state as state_lib
from corenet_tpu.train.pipeline import RecurrentEvals, TrainPipeline

from helpers import make_fixture_dataset


def _tiny_state(step=0, seed=0):
  rng = np.random.default_rng(seed)
  params = {"layer": {"kernel": jnp.asarray(rng.random((3, 4), np.float32)),
                      "bias": jnp.zeros((4,), jnp.float32)}}
  batch_stats = {"bn": {"mean": jnp.zeros((4,)), "var": jnp.ones((4,)),
                        "steps": jnp.zeros((), jnp.int32)}}
  opt = state_lib.create_optimizer()
  state = state_lib.create_train_state(
      {"params": params, "batch_stats": batch_stats}, opt, global_step=step)
  return state, opt


def test_checkpoint_roundtrip_and_tiers(tmp_path):
  state, opt = _tiny_state(step=123)
  mgr = cpt_lib.CheckpointManager(str(tmp_path / "cpt"), keep_temp=2)
  meta = {"train_config": {"x": 1}, "classes": ["__void__", "a"]}
  mgr.save_state(state, meta)

  template, _ = _tiny_state()
  loaded, got_meta, path = mgr.read_last_checkpoint(template)
  assert int(loaded.global_step) == 123
  assert got_meta == meta
  tt.assert_allclose(np.asarray(loaded.params["layer"]["kernel"]),
                     np.asarray(state.params["layer"]["kernel"]))
  # Adam state round-trips.
  chex = __import__("chex")
  jax.tree_util.tree_map(
      lambda a, b: tt.assert_allclose(np.asarray(a), np.asarray(b)),
      loaded.opt_state, state.opt_state)

  # Rolling temp tier keeps only the last 2; persistent kept forever.
  for s in (200, 300, 400):
    mgr.save_state(state.replace(global_step=jnp.asarray(s, jnp.int32)), meta)
  mgr.save_state(state.replace(global_step=jnp.asarray(250, jnp.int32)),
                 meta, persistent=True)
  temp = [p for p in mgr.list_checkpoints() if "/temp/" in p]
  assert [int(os.path.basename(p)[6:-4]) for p in temp] == [300, 400]
  persistent = [p for p in mgr.list_checkpoints() if "/persistent/" in p]
  assert [int(os.path.basename(p)[6:-4]) for p in persistent] == [250]
  # Newest overall wins.
  _, _, last = mgr.read_last_checkpoint(template)
  assert last.endswith("state_000000400.cpt")
  # Decode without a template returns raw trees.
  raw, meta2 = cpt_lib.decode_state(
      __import__("corenet_tpu.utils.fs", fromlist=["fs"]).read_bytes(last))
  assert meta2 == meta


def test_super_resolution_interleave():
  native = (4, 4, 4)
  m = 2

  def fake_inference(image, camera, v2x, offsets):
    # pmf value encodes the offset index; shapes [O, B, d, h, w, C].
    o = offsets.shape[0]
    b = image.shape[0]
    vals = jnp.arange(o, dtype=jnp.float32)[:, None, None, None, None, None]
    return jnp.broadcast_to(vals, (o, b, *native, 1))

  sri = SuperResolutionInference(fake_inference, native)
  image = jnp.zeros((2, 8, 8, 3), jnp.uint8)
  camera = jnp.eye(4)[None].repeat(2, 0)
  v2x = jnp.eye(4)[None].repeat(2, 0)
  offsets = jnp.full((2, 3), 0.5, jnp.float32)
  out = sri(image, camera, v2x, offsets, (8, 8, 8))
  assert out.shape == (2, 8, 8, 8, 1)
  out = np.asarray(out)
  for z in range(8):
    for y in range(8):
      for x in range(8):
        expected = ((z % m) * m + (y % m)) * m + (x % m)
        assert out[0, z, y, x, 0] == expected

  # Native offsets: lattice / m plus caller offsets / m.
  noff = np.asarray(sri.get_native_offsets((8, 8, 8), offsets))
  assert noff.shape == (8, 2, 3)
  tt.assert_allclose(noff[0, 0], [0.25, 0.25, 0.25])
  tt.assert_allclose(noff[-1, 0], [0.75, 0.75, 0.75])
  # Offset order is (x fastest): index 1 → (mx=1, my=0, mz=0).
  tt.assert_allclose(noff[1, 0], [0.75, 0.25, 0.25])

  with pytest.raises(ValueError):
    sri(image, camera, v2x, offsets, (10, 10, 10))  # not a multiple of 4
  with pytest.raises(ValueError):
    sri(image, camera, v2x, offsets, (8, 8, 4))  # non-uniform multiplier


@pytest.mark.slow
def test_train_eval_end_to_end(tmp_path):
  manifest, meshes_dir = make_fixture_dataset(str(tmp_path / "ds"),
                                              num_scenes=4, image_size=64)

  def data_pipeline(batch_size):
    return DataPipeline(
        datasets=[Dataset(dataset_path=manifest, meshes_dir=meshes_dir,
                          high_realism=True, shuffle=ShuffleType.NEVER)],
        shuffle=ShuffleType.NEVER,
        data_loader=DataLoaderConfig(batch_size=batch_size,
                                     num_data_workers=2),
        voxelization_config=VoxelizationConfig(
            task_type=TaskType.SEMANTIC,
            resolution=Resolution(32, 32, 32),
            voxelization_image_resolution_multiplier=2,
            # Exercise the static fill + its convergence audit.
            voxelization_fill_rounds=6))

  config = TrainConfig(
      data=data_pipeline(2),
      resnet50_imagenet_checkpoint="",
      checkpoint_interval=4,
      persistent_checkpoint_interval=1000,
      tensorboard_log_interval=2,
      initial_learning_rate=4e-4,
      fill_audit_interval=4,  # own cadence, decoupled from checkpoints
      max_steps=8)

  rec = RecurrentEvalConfig(
      start_step=0, interval=8, persistent_checkpoint=False,
      config=EvalConfig(name="mini_eval", data=data_pipeline(2)))

  from corenet_tpu.parallel import mesh as mesh_lib
  mesh = mesh_lib.create_mesh(data=2, devices=jax.devices()[:2])

  out = str(tmp_path / "out")
  pipeline = TrainPipeline(config, out, mesh=mesh)
  evals = RecurrentEvals([rec], out)
  audit_calls = []
  real_audit = pipeline.audit_static_fill
  pipeline.audit_static_fill = lambda: audit_calls.append(
      real_audit()) or audit_calls[-1]
  pipeline.run(recurrent_evals=evals)

  assert int(pipeline.state.global_step) == 8
  # Static fill in use (config) and exact on the fixture cubes.
  assert pipeline.fill_rounds == 6
  # The audit runs on ITS OWN StepEvent (fill_audit_interval=4 →
  # triggers at steps 4 and 8) plus once at the first step, and every
  # audited sample converged (VERDICT r4 #8).
  assert audit_calls == [True, True, True]
  # Successive audits rotate through batch samples (2 per host batch).
  assert pipeline._fill_audit_count == 3
  assert pipeline.audit_static_fill() is True
  cpts = pipeline.cpt_manager.list_checkpoints()
  assert cpts, "no checkpoints written"
  assert os.path.exists(
      os.path.join(out, "evals", "mini_eval", "8", "voxel_metrics.csv"))

  # Resume: a fresh pipeline picks up the newest checkpoint and step.
  pipeline2 = TrainPipeline(config, out, mesh=mesh)
  state = pipeline2.create_or_load_state()
  assert int(state.global_step) == 8
  tt.assert_allclose(
      np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
      np.asarray(jax.tree_util.tree_leaves(pipeline.state.params)[0]))
