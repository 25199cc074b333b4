"""Long-run BatchRenorm stability evidence (VERDICT r3 #9 / r4 #1).

Trains the production train step for --steps steps (default 10k — past
the 5k r/d ramp engagement) on VARIED synthetic data: --distinct batches
cycled per step, each with per-scene translated geometry, fresh images,
and random in-voxel grid offsets (the reference randomizes the offset
per scene the same way, batched_example.py:92-94). On a cadence it
records, against a held-out probe batch:

  * iou_eval   — eval-mode forward (RUNNING statistics)
  * iou_batch  — train-mode normalization (probe-batch statistics)
  * loss       — the step's reported train loss on that step's batch
  * xprog_gap  — |step-reported loss − the same loss recomputed by an
    independently compiled program from the pre-step params|

The round-3 observation was a transient loss spike (~2.1k steps) that
permanently displaced the running stats (eval-mode IoU dips while
batch-stat IoU holds); this run either shows eval-mode IoU tracking
batch-stat IoU through/after the ramp engagement, or motivates
--renorm_ramp_start 0 (the opt-in stabilizer), which can be A/B'd here.

Why the data must vary (--distinct 1 is a trap, kept only as a probe):
the first round-5 capture trained ONE fixed batch for 10k steps. The
model memorizes it (loss → 1e-7) and drives batch variances toward
zero; 1/b_std then amplifies ulp-level differences in the f32 stat
reductions between *compilations of the same math*, compounding across
~50 renorm layers until independently compiled forwards diverge
wildly (logit diff up to 83 at step 250, reported loss 3e-4 vs 0.628
recomputed — even adding aux outputs to the step changed its own
reported loss to 0.538). At init, and in any regime with non-collapsed
variances, all compilations agree to float precision (verified: kernel
vs XLA loss sums, GT grids, per-layer batch stats all bit-identical).
It is an ill-conditioning pathology of single-batch memorization, not
a miscompilation; xprog_gap makes the conditioning observable in every
future capture. See docs/bench_records/README.md (round 5).

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
  p.add_argument("--distinct", type=int, default=64,
                 help="distinct training batches cycled per step "
                 "(per-scene translated geometry, fresh images, random "
                 "grid offsets). 1 = the degenerate fixed-batch "
                 "memorization probe — see the module docstring before "
                 "interpreting its curves")
  p.add_argument("--ramp_start", type=int, default=-1,
                 help="-1 = reference default (5000); 0 = stabilizer on")
  p.add_argument("--packed", action=argparse.BooleanOptionalAction,
                 default=True, help="packed (space-to-depth) decoder "
                 "execution for the train model (production default)")
  p.add_argument("--phase", action=argparse.BooleanOptionalAction,
                 default=True, help="phase-major loss execution "
                 "(production default); --no-phase trains on fine logits")
  p.add_argument("--out", type=str, default="/tmp/renorm_longrun.json")
  args = p.parse_args()

  import jax
  jax.config.update("jax_compilation_cache_dir",
                    os.path.join(_REPO, ".jax_cache"))
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
  import jax.numpy as jnp
  import numpy as np
  from corenet_tpu.models import batch_renorm
  from corenet_tpu.models import losses
  from corenet_tpu.models.corenet import (CoreNet, CoreNetConfig,
                                          DecoderConfig)
  from corenet_tpu.parallel import mesh as mesh_lib
  from corenet_tpu.train import state as state_lib
  from corenet_tpu.train.gt import voxelize_batch
  from corenet_tpu.train.step import (compute_v2s, make_eval_forward,
                                      make_train_step)

  if args.ramp_start >= 0:
    batch_renorm.set_ramp_start(args.ramp_start)

  sys.path.insert(0, ".")
  from bench import _scene_inputs  # production-shaped synthetic scenes

  resolution = (128, 128, 128)
  irm, window = 8, 24
  # conservative_rasterization lives in the SHARED vox dict so the train
  # step and the IoU-yardstick grid below are voxelized identically even
  # if gt.py's default ever changes (advisor r4). True matches the train
  # step's current default; an early capture of this run used a
  # mismatched False here and produced a bogus 0.39 IoU plateau.
  vox = dict(algorithm="raster", image_resolution_multiplier=irm,
             max_bbox_pixels=window, conservative_rasterization=True)
  required_max_edge = (window - 4) / irm / max(resolution)
  base = _scene_inputs(args.batch, args.image_size, resolution,
                       args.tris, num_mesh=1,
                       required_max_edge=required_max_edge)

  def vary(seed):
    """A distinct production-like batch: per-scene translated shell
    (translation preserves edge lengths, so the rasterizer window
    contract still holds), fresh image pixels, random in-voxel offset.
    The shell spans [0.3,0.7]^3; ±0.12 keeps it inside the grid."""
    rng = np.random.RandomState(seed)
    b = {k: np.array(v, copy=True) for k, v in base.items()}
    t = rng.uniform(-0.12, 0.12, (args.batch, 1, 1, 3)).astype(np.float32)
    b["triangles"] = b["triangles"] + t  # padded tris stay tri_valid=False
    b["image"] = (rng.rand(*b["image"].shape) * 255).astype(np.uint8)
    b["grid_offset"] = rng.rand(args.batch, 3).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in b.items()}

  train_batches = [vary(100 + k) for k in range(max(args.distinct, 1))]
  probe = vary(99991)  # held out — never trained on

  model = CoreNet(CoreNetConfig(decoder=DecoderConfig(
      resolution=resolution, num_output_channels=2)),
      compute_dtype=jnp.bfloat16, packed_decoder=args.packed,
      phase_output=args.phase)
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

    # The IoU yardstick must be the SAME grid the train step fits: both
    # come from the one shared `vox` dict above.
    yard_vox = {k: v for k, v in vox.items() if k != "algorithm"}

    @jax.jit
    def yard_gt(batch):
      return voxelize_batch(
          batch["triangles"], batch["tri_mesh_slot"], batch["tri_valid"],
          batch["mesh_labels"], batch["grid_offset"],
          resolution=resolution, **yard_vox)

    probe_gt_dev, probe_v2x = yard_gt(probe)
    probe_fg = (np.asarray(jax.device_get(probe_gt_dev)) > 0)

    @jax.jit
    def batchstat_logits(params, batch_stats, batch, v2x):
      # Train-mode normalization (batch statistics) without state update
      # — an independently compiled program from the train step's.
      v2s = compute_v2s(batch["camera"], v2x)
      logits, _ = eval_model.apply(
          {"params": params, "batch_stats": batch_stats},
          batch["image"], v2s, batch["grid_offset"], train=True,
          mutable=["batch_stats"])
      return logits

    @jax.jit
    def xprog_loss(params, batch_stats, batch, gt, v2x):
      # The step's loss, recomputed end-to-end by a second compilation.
      lg = batchstat_logits(params, batch_stats, batch, v2x)
      return losses.iou_fgbg(gt, lg.astype(jnp.float32))

    def iou(pred_fg):
      inter = float(np.logical_and(pred_fg, probe_fg).sum())
      union = float(np.logical_or(pred_fg, probe_fg).sum())
      return inter / max(union, 1.0)

    curves = {"step": [], "loss": [], "iou_eval": [], "iou_batch": [],
              "xprog_gap": []}
    t0 = time.time()
    for i in range(args.steps):
      batch = train_batches[i % len(train_batches)]
      will_eval = (i + 1) % args.eval_every == 0 or i == 0
      if will_eval:
        prev = state
      state, metrics = train_step(state, batch)
      if will_eval:
        loss = float(jax.device_get(metrics["loss"]))
        # Cross-program consistency: same pre-step params/stats, same
        # batch, same math — an independent compilation's loss.
        b_gt, b_v2x = yard_gt(batch)
        xloss = float(jax.device_get(xprog_loss(
            prev.params, prev.batch_stats, batch, b_gt, b_v2x)))
        variables_now = {"params": state.params,
                         "batch_stats": state.batch_stats}
        pmf = fwd(variables_now, probe["image"], probe["camera"],
                  probe_v2x, probe["grid_offset"])
        pred_eval = np.asarray(jax.device_get(pmf)).argmax(-1) > 0
        lg = batchstat_logits(state.params, state.batch_stats, probe,
                              probe_v2x)
        pred_batch = np.asarray(jax.device_get(lg)).argmax(-1) > 0
        curves["step"].append(i + 1)
        curves["loss"].append(loss)
        curves["iou_eval"].append(iou(pred_eval))
        curves["iou_batch"].append(iou(pred_batch))
        curves["xprog_gap"].append(abs(loss - xloss))
        log(f"[renorm_longrun] step {i+1}: loss={loss:.5f} "
            f"iou_eval={curves['iou_eval'][-1]:.4f} "
            f"iou_batch={curves['iou_batch'][-1]:.4f} "
            f"xprog_gap={curves['xprog_gap'][-1]:.2e} "
            f"({(time.time()-t0):.0f}s)")

  result = dict(vars(args), curves=curves,
                ramp_start_effective=batch_renorm.ramp_start())
  with open(args.out, "w") as f:
    json.dump(result, f)
  log(f"[renorm_longrun] wrote {args.out}")
  print(json.dumps({"steps": args.steps,
                    "final_iou_eval": curves["iou_eval"][-1],
                    "final_iou_batch": curves["iou_batch"][-1],
                    "max_xprog_gap": max(curves["xprog_gap"]),
                    "min_iou_eval_after_1k": min(
                        (v for s, v in zip(curves["step"],
                                           curves["iou_eval"])
                         if s >= 1000), default=None)}))


if __name__ == "__main__":
  main()
