"""Multi-process (multi-host-shaped) tests: two real JAX processes over the
distributed coordinator exercise the cross-host reduction and barrier
paths (the reference only ever tested multi-GPU manually — SURVEY §4)."""

import os
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import sys, os
    os.environ["PYTHONPATH"] = ""
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    jax.distributed.initialize(coordinator_address="127.0.0.1:%d",
                               num_processes=2, process_id=pid,
                               initialization_timeout=600,
                               heartbeat_timeout_seconds=900,
                               shutdown_timeout_seconds=900)
    sys.path.insert(0, %r)
    import numpy as np
    from corenet_tpu.eval.results import QuantitativeResults
    q = QuantitativeResults(["__void__", "a"], "FG_BG")
    q.confusion += np.array([[1, 2], [3, 4]]) * (pid + 1)
    q.reduce_across_hosts()
    assert (q.confusion == np.array([[3, 6], [9, 12]])).all(), q.confusion
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("done")
    print(f"proc {pid} ok", flush=True)
""")


@pytest.mark.slow
def test_two_process_confusion_reduce(tmp_path):
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  port = 19741
  script = tmp_path / "worker.py"
  script.write_text(_WORKER % (port, repo))
  env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
  env.pop("XLA_FLAGS", None)
  procs = [subprocess.Popen([sys.executable, str(script), str(i)], env=env,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT)
           for i in range(2)]
  outs = [p.communicate(timeout=120)[0].decode() for p in procs]
  for i, (p, out) in enumerate(zip(procs, outs)):
    assert p.returncode == 0, f"proc {i} failed:\n{out}"
    assert f"proc {i} ok" in out


# Two JAX processes, one CPU device each, forming a ('data'=2,) mesh: every
# process feeds ONLY ITS OWN row of the batch through shard_batch (the
# multi-host global-batch assembly of parallel/mesh.py), runs one full
# train step, and the loss must equal the single-process loss on the
# concatenated batch — the reference's DDP semantics
# (pipeline.py:199-201, distributed.py:96-138).
_TRAIN_WORKER = textwrap.dedent("""
    import sys, os
    os.environ["PYTHONPATH"] = ""
    import jax
    jax.config.update("jax_platforms", "cpu")
    repo = %r
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    pid = int(sys.argv[1])
    # Generous timeouts: this can run on a single-core host where two
    # simultaneous XLA compiles starve the heartbeat threads for minutes.
    jax.distributed.initialize(coordinator_address="127.0.0.1:%d",
                               num_processes=2, process_id=pid,
                               initialization_timeout=600,
                               heartbeat_timeout_seconds=900,
                               shutdown_timeout_seconds=900)
    assert jax.process_count() == 2 and len(jax.devices()) == 2
    sys.path.insert(0, repo)
    import numpy as np
    import jax.numpy as jnp
    from corenet_tpu.models.corenet import (
        CoreNet, CoreNetConfig, DecoderConfig)
    from corenet_tpu.parallel import mesh as mesh_lib
    from corenet_tpu.train import state as state_lib
    from corenet_tpu.train.step import make_train_step
    from __graft_entry__ import _example_inputs

    resolution = (32, 32, 32)
    model = CoreNet(CoreNetConfig(decoder=DecoderConfig(
        resolution=resolution, num_output_channels=2)))
    optimizer = state_lib.create_optimizer()
    mesh = mesh_lib.create_mesh()
    with mesh:
      init_image = jnp.zeros((1, 64, 64, 3), jnp.uint8)
      variables = jax.jit(lambda: model.init(
          jax.random.PRNGKey(0), init_image, jnp.eye(4)[None],
          jnp.full((1, 3), 0.5), train=False))()
      state = state_lib.create_train_state(variables, optimizer)
      state = mesh_lib.replicate_tree(mesh, state)
      gt_mode = sys.argv[3]
      if gt_mode == "parity":
        # Parity GT: its collective schedule is inherently static.
        vox = dict(algorithm="parity")
      else:
        # Raster GT (the production default) with a STATIC fill round
        # count: the adaptive fill's while_loop cond is a per-round
        # 1-byte all-reduce with a data-dependent trip count, which
        # desynchronizes Gloo's stream pairing across processes (the
        # multi-host hazard class of VERDICT r2 #4). fill_rounds
        # staticizes the collective schedule — TrainPipeline sets it
        # automatically when process_count > 1.
        vox = dict(algorithm="raster", image_resolution_multiplier=2,
                   max_bbox_pixels=24, fill_rounds=6)
      step = make_train_step(
          model, optimizer, "FG_BG", resolution,
          voxelization_kwargs=vox,
          donate=False, mesh=mesh)
      full = _example_inputs(2, 64, resolution)
      local = {k: v[pid:pid + 1] for k, v in full.items()}
      batch = mesh_lib.shard_batch(mesh, local)
      # AOT-compile, then rendezvous on the coordination-service barrier
      # (NOT a collective): the first execution initializes Gloo contexts,
      # which have a hard 30s KeyValue timeout — on a single-core host the
      # two workers' compiles can skew by minutes.
      compiled = step.lower(state, batch).compile()
      from jax._src import distributed
      distributed.global_state.client.wait_at_barrier(
          "compiled", 1200 * 1000)
      new_state, metrics = compiled(state, batch)
      loss = float(jax.device_get(metrics["loss"]))
      assert int(new_state.global_step) == 2, int(new_state.global_step)
    expected = float(open(sys.argv[2]).read())
    assert abs(loss - expected) <= 1e-5 * max(1.0, abs(expected)), (
        loss, expected)
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("done")
    print(f"proc {pid} trainstep ok", flush=True)
""")


@pytest.mark.slow
@pytest.mark.parametrize("gt_mode", ["parity", "raster"])
def test_two_process_train_step_matches_single(tmp_path, gt_mode):
  # Single-process expected loss on the concatenated batch. Uses a
  # 2-device mesh — the IDENTICAL program the workers run — so this
  # compile populates the persistent cache and the workers (which race a
  # hard 30s Gloo-context init timeout on a single-core host) load it in
  # seconds instead of compiling for minutes at different speeds.
  import jax
  import jax.numpy as jnp
  from corenet_tpu.models.corenet import (
      CoreNet, CoreNetConfig, DecoderConfig)
  from corenet_tpu.parallel import mesh as mesh_lib
  from corenet_tpu.train import state as state_lib
  from corenet_tpu.train.step import make_train_step
  from __graft_entry__ import _example_inputs

  resolution = (32, 32, 32)
  model = CoreNet(CoreNetConfig(decoder=DecoderConfig(
      resolution=resolution, num_output_channels=2)))
  optimizer = state_lib.create_optimizer()
  mesh = mesh_lib.create_mesh(data=2, space=1, devices=jax.devices()[:2])
  with mesh:
    init_image = jnp.zeros((1, 64, 64, 3), jnp.uint8)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), init_image, jnp.eye(4)[None],
        jnp.full((1, 3), 0.5), train=False))()
    state = state_lib.create_train_state(variables, optimizer)
    state = mesh_lib.replicate_tree(mesh, state)
    vox = (dict(algorithm="parity") if gt_mode == "parity"
           else dict(algorithm="raster", image_resolution_multiplier=2,
                     max_bbox_pixels=24, fill_rounds=6))
    step = make_train_step(
        model, optimizer, "FG_BG", resolution,
        voxelization_kwargs=vox,
        donate=False, mesh=mesh)
    batch = mesh_lib.shard_batch(mesh, _example_inputs(2, 64, resolution))
    _, metrics = step(state, batch)
    expected = float(jax.device_get(metrics["loss"]))

  expected_file = tmp_path / "expected_loss.txt"
  expected_file.write_text(repr(expected))

  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  port = 19743 if gt_mode == "parity" else 19745
  script = tmp_path / "train_worker.py"
  script.write_text(_TRAIN_WORKER % (repo, port))
  env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
  env.pop("XLA_FLAGS", None)
  procs = [subprocess.Popen(
      [sys.executable, str(script), str(i), str(expected_file), gt_mode],
      env=env,
      stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
      for i in range(2)]
  outs = [p.communicate(timeout=1200)[0].decode() for p in procs]
  for i, (p, out) in enumerate(zip(procs, outs)):
    assert p.returncode == 0, f"proc {i} failed:\n{out}"
    assert f"proc {i} trainstep ok" in out


# Recurrent eval during multi-process training (the ADVICE r3 medium):
# eval is a PER-HOST program — each process runs its own dataset shard
# with its OWN number of batches (5 scenes over 2 hosts → 2 batches vs 1)
# — so its traces must never shard_map over the registered multi-host
# train mesh (non-addressable devices / lockstep deadlock). The worker
# registers the global ('data'=2) mesh exactly as a live TrainPipeline
# would, then runs an EvalPipeline with kernel forcing on; without the
# scoped-registry fix this deadlocks or errors. Also covers the
# cross-host qualitative gather: host 0's summary writer must receive
# tiles for scenes owned by host 1 (evaluation_results.py:166-182).
_EVAL_WORKER = textwrap.dedent("""
    import sys, os
    os.environ["PYTHONPATH"] = ""
    os.environ["CORENET_FORCE_KERNELS"] = "1"
    import jax
    jax.config.update("jax_platforms", "cpu")
    repo = %r
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    pid = int(sys.argv[1])
    jax.distributed.initialize(coordinator_address="127.0.0.1:%d",
                               num_processes=2, process_id=pid,
                               initialization_timeout=600,
                               heartbeat_timeout_seconds=900,
                               shutdown_timeout_seconds=900)
    assert jax.process_count() == 2
    sys.path.insert(0, repo)
    import numpy as np
    import jax.numpy as jnp
    from corenet_tpu.config.config import (
        DataPipeline, Dataset, ShuffleType, DataLoaderConfig,
        VoxelizationConfig, TaskType, Resolution, EvalConfig)
    from corenet_tpu.eval.pipeline import EvalPipeline
    from corenet_tpu.parallel import kernel_sharding, mesh as mesh_lib

    manifest, meshes_dir, out_dir = sys.argv[2], sys.argv[3], sys.argv[4]
    # Simulate an in-flight training run: the global train mesh is
    # registered (make_train_step does this at construction).
    train_mesh = mesh_lib.create_mesh()
    kernel_sharding.register_mesh(train_mesh)

    data = DataPipeline(
        datasets=[Dataset(dataset_path=manifest, meshes_dir=meshes_dir,
                          high_realism=True, shuffle=ShuffleType.NEVER)],
        shuffle=ShuffleType.NEVER,
        data_loader=DataLoaderConfig(batch_size=2, num_data_workers=1),
        voxelization_config=VoxelizationConfig(
            task_type=TaskType.FG_BG,
            resolution=Resolution(32, 32, 32),
            voxelization_image_resolution_multiplier=8))
    ec = EvalConfig(name="mp_eval", data=data,
                    num_qualitative_results=2,
                    num_qualitative_results_in_tensor_board=4)

    class RecordingWriter:
      def __init__(self):
        self.images, self.scalars = [], []
      def add_image(self, tag, img, step):
        assert np.asarray(img).ndim == 3
        self.images.append(tag)
      def add_scalar(self, tag, value, step):
        self.scalars.append(tag)
      def flush(self):
        pass

    writer = RecordingWriter() if pid == 0 else None

    def fake_inference(image, camera, v2x, offsets, resolution):
      b = image.shape[0]
      d, h, w = resolution
      return jax.nn.softmax(jnp.zeros((b, d, h, w, 2), jnp.float32), -1)

    ep = EvalPipeline(ec, out_dir, fake_inference, summary_writer=writer)
    miou = ep.run_eval(0)
    assert miou is not None
    # The registry is restored after eval: training continues on the
    # global mesh.
    assert kernel_sharding.registered_mesh() is train_mesh
    if pid == 0:
      # 2 own tiles + 2 gathered from host 1's shard.
      assert len(writer.images) == 4, writer.images
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("done")
    print(f"proc {pid} recurrenteval ok", flush=True)
""")


@pytest.mark.slow
def test_two_process_recurrent_eval(tmp_path):
  from helpers import make_fixture_dataset
  # 5 scenes over 2 hosts → shards of 3 and 2 → DIFFERENT per-host batch
  # counts (2 vs 1): the shape that deadlocks any accidentally-global
  # eval program.
  manifest, meshes_dir = make_fixture_dataset(str(tmp_path / "ds"),
                                              num_scenes=5, image_size=64)
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  port = 19747
  script = tmp_path / "eval_worker.py"
  script.write_text(_EVAL_WORKER % (repo, port))
  env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
  env.pop("XLA_FLAGS", None)
  procs = [subprocess.Popen(
      [sys.executable, str(script), str(i), manifest, meshes_dir,
       str(tmp_path / f"out{i}")], env=env,
      stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
      for i in range(2)]
  outs = [p.communicate(timeout=1200)[0].decode() for p in procs]
  for i, (p, out) in enumerate(zip(procs, outs)):
    assert p.returncode == 0, f"proc {i} failed:\n{out}"
    assert f"proc {i} recurrenteval ok" in out
