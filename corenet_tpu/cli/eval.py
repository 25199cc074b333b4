"""Checkpoint evaluation entry point.

Parity with /root/reference/src/eval.py: loads a checkpoint, rebuilds the
training config from its extra_metadata, and runs the recurrent-eval
configs whose names match --eval_names_regex through the EvalPipeline.

Usage:
  python -m corenet_tpu.cli.eval --checkpoint_path=state.cpt \
      --output_path=out [--eval_names_regex=.*]
"""

from __future__ import annotations

import dataclasses
import logging
import re

import jax

from corenet_tpu.config import TrainPipeline as TrainPipelineConfig
from corenet_tpu.config import config_from_dict
from corenet_tpu.eval.pipeline import EvalPipeline
from corenet_tpu.eval.super_resolution import super_resolution_from_model
from corenet_tpu.models.corenet import CoreNet
from corenet_tpu.train import checkpoint as cpt_lib
from corenet_tpu.train import state as state_lib
from corenet_tpu.train.pipeline import model_config_from_train_config
from corenet_tpu.utils import flags, fs

log = logging.getLogger(__name__)


@dataclasses.dataclass
class ProgramArgs:
  checkpoint_path: str = flags.flag("Path to a .cpt checkpoint")
  output_path: str = flags.flag("Directory for eval results")
  eval_names_regex: str = flags.flag(
      "Only evals whose name fully matches run", default=".*")
  max_scenes: int = flags.flag(
      "Evaluate at most this many scenes per eval (<=0: all)", default=-1)
  compilation_cache_dir: str = flags.flag(
      "Persistent XLA compilation cache directory; '' = the per-user"
      " default (~/.cache/corenet_tpu/jax_cache), 'none' disables",
      default="")
  packed_inference: bool = flags.flag(
      "Run eligible models through the packed (space-to-depth) decoder"
      " twin — same parameters, better MXU utilization; logits agree"
      " with the unpacked path within bf16 rounding (on-chip envelope"
      " in eval/super_resolution.py). --nopacked_inference forces the"
      " fine-grid execution", default=True)
  batched_offsets: bool = flags.flag(
      "Super-resolution: vmap the decoder over all m^3 offsets at once"
      " (auto-engages for <=32^3 natives; measured +77% on the y1"
      " 64-pass eval). --nobatched_offsets keeps sequential per-pass"
      " execution and its exact numerics", default=True)


def main(argv=None):
  logging.basicConfig(level=logging.INFO)
  args = flags.parse_flags(ProgramArgs, argv)

  from corenet_tpu.utils.jax_cache import enable_compilation_cache
  enable_compilation_cache(args.compilation_cache_dir)

  raw_state, extra = cpt_lib.decode_state(fs.read_bytes(args.checkpoint_path))
  full_config = config_from_dict(TrainPipelineConfig, extra["full_config"])
  train_config = full_config.train

  num_classes = len(extra["classes"])
  model_config = model_config_from_train_config(train_config, num_classes)
  model = CoreNet(model_config)
  optimizer = state_lib.create_optimizer(
      train_config.initial_learning_rate, train_config.adam_epsilon)

  # Restore with the proper pytree structure.
  import jax.numpy as jnp
  image = jnp.zeros((1, 256, 256, 3), jnp.uint8)
  variables = jax.jit(lambda: model.init(
      jax.random.PRNGKey(0), image, jnp.eye(4)[None], jnp.full((1, 3), 0.5),
      train=False))()
  template = state_lib.create_train_state(variables, optimizer)
  state, extra = cpt_lib.decode_state(
      fs.read_bytes(args.checkpoint_path), template)

  variables = {"params": state.params, "batch_stats": state.batch_stats}
  inference = super_resolution_from_model(
      model, variables, model_config.decoder.resolution,
      packed_execution=args.packed_inference,
      batch_offsets=None if args.batched_offsets else False)

  results = {}
  for rec in full_config.eval:
    if not re.fullmatch(args.eval_names_regex, rec.config.name):
      continue
    ep = EvalPipeline(rec.config, args.output_path, inference)
    miou = ep.run_eval(int(state.global_step),
                       max_scenes=args.max_scenes if args.max_scenes > 0
                       else None)
    results[rec.config.name] = miou
    log.info("eval %s: mIoU=%s", rec.config.name, miou)
  return results


if __name__ == "__main__":
  main()
