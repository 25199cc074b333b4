"""Training entry point.

Replaces the reference's dist_launch + train.py pair
(/root/reference/src/dist_launch.py, /root/reference/src/train.py): there
is no per-GPU subprocess spawning — one SPMD process per host, with
`jax.distributed.initialize()` wiring multi-host meshes. Retry/elastic
recovery is restart-from-last-checkpoint (the pipeline resumes from the
newest checkpoint and re-derives the epoch position from the global
step), matching the reference's recovery model; process supervision
belongs to the cluster scheduler rather than a custom launcher.

Usage:
  python -m corenet_tpu.cli.train --config_path=cfg.json5 \
      [-D key=value ...] [--set path=json ...] [-jq program ...] \
      [--multihost]
"""

from __future__ import annotations

import dataclasses
import logging
from typing import List

from corenet_tpu.config import TrainPipeline as TrainPipelineConfig
from corenet_tpu.config import config_to_dict, load_config_file, parse_template_mapping
from corenet_tpu.train.pipeline import RecurrentEvals, TrainPipeline
from corenet_tpu.utils import flags

log = logging.getLogger(__name__)


@dataclasses.dataclass
class ProgramArgs:
  config_path: str = flags.flag("Path to the JSON5 train pipeline config")
  template_value: List[str] = flags.flag(
      "key=value string template overrides", default=[], short_name="D",
      repeated=True)
  jq_transform: List[str] = flags.flag(
      "jq programs applied to the raw config", default=[], short_name="jq",
      repeated=True)
  set: List[str] = flags.flag(
      "dotted-path structural overrides, e.g. train.max_steps=1000",
      default=[], repeated=True)
  max_steps: int = flags.flag(
      "Overrides config max_steps when >= 0", default=-1)
  multihost: bool = flags.flag(
      "Call jax.distributed.initialize() for multi-host meshes",
      default=False)
  space: int = flags.flag(
      "Size of the 'space' mesh axis: shards the voxel grid's depth axis"
      " across chips (spatial partitioning of the 3D decoder; devices /"
      " space become the 'data' axis)", default=1)
  gt_mode: str = flags.flag(
      "GT generation: 'device' (in the jitted step) or 'host' (native C++"
      " in loader threads)", default="device")
  gt_algorithm: str = flags.flag(
      "'raster' (reference-bit-parity rasterize+fill) or 'parity' (exact"
      " center sampling, ~2x faster, closed meshes)", default="raster")
  compute_dtype: str = flags.flag(
      "'bfloat16' (TPU production default; f32 params/stats) or"
      " 'float32' (reference bit-parity mode)", default="bfloat16")
  decoder_execution: str = flags.flag(
      "'auto' (packed where eligible), 'fine', or 'packed'"
      " (space-to-depth decoder execution; identical parameters/"
      "checkpoints)", default="auto")
  phase_loss: str = flags.flag(
      "'auto' (on for eligible FG_BG configs), 'on', or 'off': train the"
      " loss on phase-major final-stage logits, skipping the"
      " full-resolution interleave", default="auto")
  renorm_ramp_start: int = flags.flag(
      "Step at which the BatchRenorm r/d ramps engage. -1 = the"
      " reference's 5000 (bit-parity default); 0 engages renorm"
      " correction from the first step — an opt-in stabilizer against"
      " running-stat displacement before the ramps start", default=-1)
  profile_dir: str = flags.flag(
      "When set, capture a jax.profiler trace (xplane) of profile_steps"
      " training iterations into this directory", default="")
  profile_start: int = flags.flag(
      "Loop iteration at which the profiler trace starts (skip"
      " compile/warmup)", default=20)
  profile_steps: int = flags.flag(
      "Number of iterations to trace", default=10)
  compilation_cache_dir: str = flags.flag(
      "Persistent XLA compilation cache directory; '' = the per-user"
      " default (~/.cache/corenet_tpu/jax_cache), 'none' disables. Makes"
      " restart-from-checkpoint recovery cheap: a warm restart skips the"
      " ~10-minute cold compile of the production step", default="")


def main(argv=None):
  logging.basicConfig(
      level=logging.INFO,
      format="%(levelname).1s%(asctime)s %(filename)s:%(lineno)d] "
             "%(message)s")
  args = flags.parse_flags(ProgramArgs, argv)

  from corenet_tpu.utils.jax_cache import enable_compilation_cache
  enable_compilation_cache(args.compilation_cache_dir)

  if args.multihost:
    import jax
    jax.distributed.initialize()

  config = load_config_file(
      args.config_path, TrainPipelineConfig,
      jq_transforms=args.jq_transform, set_overrides=args.set,
      template_overrides=parse_template_mapping(args.template_value))

  mesh = None
  if args.space > 1:
    from corenet_tpu.parallel import mesh as mesh_lib
    mesh = mesh_lib.create_mesh(space=args.space)

  pipeline = TrainPipeline(
      config.train, config.output_path, mesh=mesh,
      extra_metadata={"train_config": config_to_dict(config.train),
                      "full_config": config_to_dict(config)},
      gt_mode=args.gt_mode, gt_algorithm=args.gt_algorithm,
      compute_dtype=args.compute_dtype,
      decoder_execution=args.decoder_execution,
      phase_loss={"auto": None, "on": True, "off": False}[args.phase_loss],
      renorm_ramp_start=(None if args.renorm_ramp_start < 0
                         else args.renorm_ramp_start))
  evals = RecurrentEvals(config.eval, config.output_path)
  max_steps = args.max_steps if args.max_steps >= 0 else None
  pipeline.run(recurrent_evals=evals, max_steps=max_steps,
               profile_dir=args.profile_dir or None,
               profile_start=args.profile_start,
               profile_steps=args.profile_steps)


if __name__ == "__main__":
  main()
