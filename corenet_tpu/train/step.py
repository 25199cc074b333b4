"""The jitted training / eval step: GT voxelization → forward → loss →
Adam update, one XLA program.

Replaces the reference's _process_batch
(/root/reference/src/corenet/pipeline.py:215-240), which round-trips
host ↔ GPU between the GL voxelizer, CUDA flood fill, DDP forward/backward
and the optimizer. Here everything after host batch assembly is a single
compiled computation; under a ('data', 'space') mesh the batch dimension
of every input is sharded and XLA inserts the gradient all-reduce
(the DDP/NCCL equivalent) automatically.

Loss selection per task matches pipeline.py:154-158: FG_BG → iou_fgbg,
SEMANTIC → xent_times_iou_agnostic.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from corenet_tpu.models import losses
from corenet_tpu.train import gt
from corenet_tpu.train.state import TrainState

Batch = Dict[str, jnp.ndarray]


def loss_fn_for_task(task_type: str) -> Callable:
  if task_type == "FG_BG":
    return losses.iou_fgbg
  if task_type == "SEMANTIC":
    return losses.xent_times_iou_agnostic
  raise ValueError(f"Unknown task type {task_type!r}")


def compute_v2s(camera_transform: jnp.ndarray,
                v2x_transform: jnp.ndarray) -> jnp.ndarray:
  """voxel→screen matrix: camera @ v2x⁻¹ (pipeline.py:220). The v2x used
  everywhere is a pure diagonal scale, so invert it analytically."""
  diag = jnp.concatenate(
      [1.0 / jnp.diagonal(v2x_transform[..., :3, :3], axis1=-2, axis2=-1),
       jnp.ones(v2x_transform.shape[:-2] + (1,), jnp.float32)], axis=-1)
  inv = jnp.zeros_like(v2x_transform)
  inv = jax.vmap(jnp.diag)(diag) if v2x_transform.ndim == 3 else jnp.diag(diag)
  return camera_transform @ inv


def make_train_step(model,
                    optimizer: optax.GradientTransformation,
                    task_type: str,
                    resolution: Tuple[int, int, int],
                    voxelization_kwargs: Optional[Dict[str, Any]] = None,
                    donate: bool = True,
                    mesh=None):
  """Builds the jitted train step.

  The returned function has signature (state, batch) → (state, metrics).
  Batch keys (all leading dim = global batch, shardable over 'data'):
    image          uint8[B, H, W, 3]
    camera         float32[B, 4, 4]
    triangles      float32[B, T, 3, 3]   (view space)
    tri_mesh_slot  int32[B, T]
    tri_valid      bool[B, T]
    mesh_labels    int32[B, M]           (voxel value per mesh slot)
    grid_offset    float32[B, 3]
  Alternatively a precomputed 'grid' int32[B, D, H, W] (+ 'v2x') skips the
  on-device voxelization (host-GT mode).
  """
  loss_fn = loss_fn_for_task(task_type)
  if mesh is not None:
    # Keep the Pallas fast paths on this mesh: under pure data
    # parallelism the kernels shard_map over 'data' instead of falling
    # back to the XLA lowerings (parallel/kernel_sharding.py).
    from corenet_tpu.parallel import kernel_sharding
    kernel_sharding.register_mesh(mesh)
  vox_kwargs = dict(voxelization_kwargs or {})
  vox_kwargs.setdefault("resolution", tuple(resolution))
  # 'raster' = rasterize + flood fill (bit-parity with the reference GT
  # pipeline); 'parity' = exact center-sampling via XOR ray crossings
  # (voxel/parity.py) — much faster, requires closed meshes.
  gt_algorithm = vox_kwargs.pop("algorithm", "raster")

  # Spatial partitioning ("sp" analogue — SURVEY §5: the voxel grid is
  # this workload's big dimension): when the mesh has a non-trivial
  # 'space' axis, the GT grid and logits are constrained to
  # P('data', 'space') so XLA partitions the 3D decoder spatially
  # (with halo exchanges for the convs) instead of replicating it.
  space_sharding = None
  if mesh is not None and mesh.shape.get("space", 1) > 1:
    from jax.sharding import NamedSharding, PartitionSpec
    space_sharding = NamedSharding(mesh, PartitionSpec("data", "space"))

  phase_loss = bool(getattr(model, "phase_output", False))
  # Phase factor per axis: the packed decoder's deep-phase output is
  # factor 4³ = 64, the fine decoder's phased last stage 2³ = 8.
  phase_s = 4 if bool(getattr(model, "packed_decoder", False)) else 2
  # Under 'space' sharding the phased tensors [B, D/s, H/s, (W/s)·s³·C]
  # shard their coarse-depth dim over 'space' exactly like the fine
  # grid would: the loss is voxel-order invariant and fully reduced, so
  # spatially partitioning the phase-major layout is semantically
  # identical (the reference's DDP step loses nothing at any world
  # size, pipeline.py:199-201 — neither does this path at any mesh
  # shape; VERDICT r4 #4 lifted the former single-shard restriction).

  def constrain(x):
    if space_sharding is None:
      return x
    return jax.lax.with_sharding_constraint(x, space_sharding)

  def step(state: TrainState, batch: Batch):
    if mesh is not None:
      # Re-bind at TRACE time: the registry is process-global, and a
      # second pipeline with a different mesh may have re-registered
      # between this step's construction and its first call — the
      # kernels consult the registry inside the trace, so each trace
      # must pin its own mesh (runtime calls never re-run this).
      from corenet_tpu.parallel import kernel_sharding
      kernel_sharding.register_mesh(mesh)
    gp_gt = None  # phased u8 GT from the bit-packed fast path
    if "grid" in batch:
      grid, v2x = batch["grid"], batch["v2x"]
    elif gt_algorithm == "parity":
      from corenet_tpu.voxel.parity import parity_voxelize_batch
      grid, v2x = parity_voxelize_batch(
          batch["triangles"], batch["tri_mesh_slot"], batch["tri_valid"],
          batch["mesh_labels"], batch["grid_offset"],
          num_mesh_slots=batch["mesh_labels"].shape[1],
          resolution=vox_kwargs["resolution"])
    elif (phase_loss and task_type == "FG_BG"
          and gt.packed_fgbg_eligible(batch["image"].shape[0],
                                      **vox_kwargs)):
      # Binary phase-loss GT never leaves the bit-packed form: the
      # phased u8 grid comes straight from the packed words
      # (ops/phased_gt.py), skipping the full-grid unpack, the label
      # compose, and the 10-D phase permute (~9 ms/step at 128³).
      packed_or, v2x = gt.voxelize_batch_packed_fgbg(
          batch["triangles"], batch["tri_mesh_slot"], batch["tri_valid"],
          batch["mesh_labels"], batch["grid_offset"], **vox_kwargs)
      from corenet_tpu.ops.phased_gt import phased_gt
      gp_gt = phased_gt(packed_or, phase_s)
      grid = None
    else:
      grid, v2x = gt.voxelize_batch(
          batch["triangles"], batch["tri_mesh_slot"], batch["tri_valid"],
          batch["mesh_labels"], batch["grid_offset"], **vox_kwargs)
    if grid is not None:
      grid = constrain(grid)
    v2s = compute_v2s(batch["camera"], v2x)

    def compute_loss(params):
      logits, updates = model.apply(
          {"params": params, "batch_stats": state.batch_stats},
          batch["image"], v2s, batch["grid_offset"], train=True,
          mutable=["batch_stats"])
      if space_sharding is not None:
        logits = jax.lax.with_sharding_constraint(
            logits, space_sharding)
      if phase_loss:
        # Phase-packed logits: the loss is voxel-order invariant, so
        # pair a phased VIEW of the logits (free, row-major reshape)
        # with a phased copy of the GT grid instead of
        # depth_to_space-ing 128³ logits. One uint8 transpose of the GT
        # replaces full-resolution bf16/f32 reshuffles + f32 converts.
        # Two layouts: factor 8 ([B, D/2, ..., 8*C], channels
        # (pz,py,px,c) — fine decoder) or factor 64 ([B, D/4, ...,
        # 64*C], channels (rm0,rm1,rm2,pz,py,px,c) — packed decoder
        # with the stage_6 rm-interleave also skipped; fine index
        # Z = 4*j + 2*rm + pz per axis).
        b, dq, hq, wq, pc = logits.shape
        nc = model.config.decoder.num_output_channels
        factor = pc // nc
        if gp_gt is not None:
          assert factor == phase_s ** 3, (factor, phase_s)
          gp = constrain(gp_gt)
        else:
          g8 = grid.astype(jnp.uint8)
          if factor == 8:
            gp = g8.reshape(b, dq, 2, hq, 2, wq, 2)
            gp = jnp.transpose(gp, (0, 1, 3, 5, 2, 4, 6))
          else:
            assert factor == 64, factor
            gp = g8.reshape(b, dq, 2, 2, hq, 2, 2, wq, 2, 2)
            gp = jnp.transpose(gp, (0, 1, 4, 7, 2, 5, 8, 3, 6, 9))
          gp = constrain(gp.reshape(b, dq, hq, wq * factor))
        return loss_fn(gp, logits.reshape(b, dq, hq, wq * factor,
                                          nc)), updates
      return loss_fn(grid, logits), updates

    (loss, updates), grads = jax.value_and_grad(
        compute_loss, has_aux=True)(state.params)
    opt_updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
    params = optax.apply_updates(state.params, opt_updates)
    batch_size = batch["image"].shape[0]
    new_state = state.replace(
        global_step=state.global_step + batch_size,
        params=params,
        batch_stats=updates["batch_stats"],
        opt_state=opt_state)
    metrics = {"loss": loss}
    return new_state, metrics

  return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_forward(model,
                      resolution: Tuple[int, int, int]):
  """Jitted inference: image + camera + v2x + offsets → class PMF
  [B, D, H, W, C] (softmax over channels), the InferenceFn contract of
  pipeline.py:261-276 in channel-last form."""

  def forward(variables, image, camera, v2x, grid_offset):
    v2s = compute_v2s(camera, v2x)
    logits = model.apply(variables, image, v2s, grid_offset, train=False)
    return jax.nn.softmax(logits, axis=-1)

  return jax.jit(forward)
