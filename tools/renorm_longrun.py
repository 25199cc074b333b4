"""Long-run BatchRenorm stability evidence (VERDICT r3 #9).

Runs a fixed synthetic batch through the production train step for
--steps steps (default 10k — past the 5k ramp engagement), recording on
a cadence: train loss, fine-grid foreground IoU against the on-device GT
under BATCH statistics (train-mode normalization) and under the RUNNING
statistics (eval mode). The round-3 observation was a transient loss
spike (~2.1k steps) that permanently displaced the running stats
(eval-mode IoU dips while batch-stat IoU holds); this run either shows
the displacement healing after the ramps engage, or motivates
--renorm_ramp_start 0 (the opt-in stabilizer), which can be A/B'd here.

Usage (on the real chip):
  python tools/renorm_longrun.py --steps 10000 --out /tmp/renorm_run.json
  python tools/renorm_longrun.py --ramp_start 0 --out /tmp/renorm_rs0.json
Writes one JSON with the full curves; prints tail summaries to stderr.
"""

import argparse
import json
import os
import sys
import time

# Runnable from any cwd: the repo root (parent of tools/) onto sys.path.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for _p in (_REPO, "."):
  if _p not in sys.path:
    sys.path.insert(0, _p)


def log(msg):
  print(msg, file=sys.stderr, flush=True)


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--steps", type=int, default=10_000)
  p.add_argument("--eval_every", type=int, default=250)
  p.add_argument("--batch", type=int, default=8)
  p.add_argument("--image_size", type=int, default=256)
  p.add_argument("--tris", type=int, default=2500)
  p.add_argument("--lr", type=float, default=1e-3)
  p.add_argument("--ramp_start", type=int, default=-1,
                 help="-1 = reference default (5000); 0 = stabilizer on")
  p.add_argument("--out", type=str, default="/tmp/renorm_longrun.json")
  args = p.parse_args()

  import jax
  jax.config.update("jax_compilation_cache_dir",
                    os.path.join(_REPO, ".jax_cache"))
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
  import jax.numpy as jnp
  import numpy as np
  from corenet_tpu.models import batch_renorm
  from corenet_tpu.models.corenet import (CoreNet, CoreNetConfig,
                                          DecoderConfig)
  from corenet_tpu.parallel import mesh as mesh_lib
  from corenet_tpu.train import state as state_lib
  from corenet_tpu.train.step import make_train_step, make_eval_forward

  if args.ramp_start >= 0:
    batch_renorm.set_ramp_start(args.ramp_start)

  sys.path.insert(0, ".")
  from bench import _scene_inputs  # production-shaped synthetic scenes

  resolution = (128, 128, 128)
  irm, window = 8, 24
  vox = dict(algorithm="raster", image_resolution_multiplier=irm,
             max_bbox_pixels=window)
  required_max_edge = (window - 4) / irm / max(resolution)
  inputs = _scene_inputs(args.batch, args.image_size, resolution,
                         args.tris, num_mesh=1,
                         required_max_edge=required_max_edge)
  inputs = {k: jnp.asarray(v) for k, v in inputs.items()}

  model = CoreNet(CoreNetConfig(decoder=DecoderConfig(
      resolution=resolution, num_output_channels=2)),
      compute_dtype=jnp.bfloat16, packed_decoder=True, phase_output=True)
  eval_model = CoreNet(CoreNetConfig(decoder=DecoderConfig(
      resolution=resolution, num_output_channels=2)),
      compute_dtype=jnp.bfloat16)
  optimizer = state_lib.create_optimizer(args.lr)
  mesh = mesh_lib.create_mesh()

  with mesh:
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, args.image_size, args.image_size, 3), jnp.uint8),
        jnp.eye(4)[None], jnp.full((1, 3), 0.5), train=False))()
    state = state_lib.create_train_state(variables, optimizer)
    state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, mesh_lib.replicated_sharding(mesh)),
        state)
    train_step = make_train_step(model, optimizer, "FG_BG", resolution,
                                 voxelization_kwargs=dict(vox),
                                 donate=False, mesh=mesh)
    fwd = make_eval_forward(eval_model, resolution)

    from corenet_tpu.train.gt import voxelize_batch
    # The IoU yardstick must be the SAME grid the train step fits:
    # make_train_step leaves conservative_rasterization at its default
    # (True). The first capture of this run used False here, and the
    # converged model's batch-stat IoU plateaued at |thin|/|conservative|
    # ≈ 0.39 against the mismatched thinner grid — a yardstick bug, not
    # a training pathology.
    gt_grid, v2x = jax.jit(lambda: voxelize_batch(
        inputs["triangles"], inputs["tri_mesh_slot"], inputs["tri_valid"],
        inputs["mesh_labels"], inputs["grid_offset"],
        resolution=resolution, image_resolution_multiplier=irm,
        max_bbox_pixels=window, conservative_rasterization=True))()
    gt_fg = (np.asarray(jax.device_get(gt_grid)) > 0)

    @jax.jit
    def batchstat_logits(params, batch_stats):
      # Train-mode normalization (batch statistics) without state update.
      from corenet_tpu.train.step import compute_v2s
      v2s = compute_v2s(inputs["camera"], v2x)
      logits, _ = eval_model.apply(
          {"params": params, "batch_stats": batch_stats},
          inputs["image"], v2s, inputs["grid_offset"], train=True,
          mutable=["batch_stats"])
      return logits

    def iou(pred_fg):
      inter = float(np.logical_and(pred_fg, gt_fg).sum())
      union = float(np.logical_or(pred_fg, gt_fg).sum())
      return inter / max(union, 1.0)

    curves = {"step": [], "loss": [], "iou_eval": [], "iou_batch": []}
    t0 = time.time()
    for i in range(args.steps):
      state, metrics = train_step(state, inputs)
      if (i + 1) % args.eval_every == 0 or i == 0:
        loss = float(jax.device_get(metrics["loss"]))
        variables_now = {"params": state.params,
                         "batch_stats": state.batch_stats}
        pmf = fwd(variables_now, inputs["image"], inputs["camera"], v2x,
                  inputs["grid_offset"])
        pred_eval = np.asarray(jax.device_get(pmf)).argmax(-1) > 0
        lg = batchstat_logits(state.params, state.batch_stats)
        pred_batch = np.asarray(jax.device_get(lg)).argmax(-1) > 0
        curves["step"].append(i + 1)
        curves["loss"].append(loss)
        curves["iou_eval"].append(iou(pred_eval))
        curves["iou_batch"].append(iou(pred_batch))
        log(f"[renorm_longrun] step {i+1}: loss={loss:.5f} "
            f"iou_eval={curves['iou_eval'][-1]:.4f} "
            f"iou_batch={curves['iou_batch'][-1]:.4f} "
            f"({(time.time()-t0):.0f}s)")

  result = dict(vars(args), curves=curves,
                ramp_start_effective=batch_renorm.ramp_start())
  with open(args.out, "w") as f:
    json.dump(result, f)
  log(f"[renorm_longrun] wrote {args.out}")
  print(json.dumps({"steps": args.steps,
                    "final_iou_eval": curves["iou_eval"][-1],
                    "final_iou_batch": curves["iou_batch"][-1],
                    "min_iou_eval_after_1k": min(
                        v for s, v in zip(curves["step"],
                                          curves["iou_eval"])
                        if s >= 1000)}))


if __name__ == "__main__":
  main()
