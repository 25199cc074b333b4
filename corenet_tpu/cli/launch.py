"""Supervised launcher with whole-job retry.

The reference's dist_launch spawns one process per GPU and, on any child
failure, kills all and relaunches the whole job up to --num_retries after
--retry_wait_sec (/root/reference/src/dist_launch.py:51-105). Under SPMD
there is nothing to fan out on a host — one process drives all local
chips — so what remains of that launcher is its supervision/retry policy,
which this tool provides around any corenet-tpu command. Recovery is
restart-from-last-checkpoint: the training pipeline resumes from the
newest checkpoint and re-derives the data-epoch position from the global
step.

Usage:
  python -m corenet_tpu.cli.launch --num_retries=3 --retry_wait_sec=90 -- \
      python -m corenet_tpu.cli.train --config_path=cfg.json5
"""

from __future__ import annotations

import dataclasses
import logging
import subprocess
import sys
import time
from typing import List

from corenet_tpu.utils import flags

log = logging.getLogger(__name__)


@dataclasses.dataclass
class ProgramArgs:
  num_retries: int = flags.flag("Relaunches after failure", default=3)
  retry_wait_sec: float = flags.flag("Seconds to wait before a retry",
                                     default=90.0)
  command: List[str] = flags.flag("The command to supervise", default=[],
                                  kind=flags.ArgKind.REMAINDER)


def main(argv=None):
  logging.basicConfig(level=logging.INFO)
  args = flags.parse_flags(ProgramArgs, argv)
  command = [c for c in args.command if c != "--"]
  if not command:
    raise SystemExit("No command given (pass it after --)")

  attempt = 0
  while True:
    log.info("Launching (attempt %d): %s", attempt + 1, " ".join(command))
    proc = subprocess.run(command)
    if proc.returncode == 0:
      log.info("Command finished successfully")
      return 0
    attempt += 1
    if attempt > args.num_retries:
      log.error("Command failed with %d after %d attempts; giving up",
                proc.returncode, attempt)
      return proc.returncode
    log.warning("Command failed with %d; retrying in %.0f s (%d/%d)",
                proc.returncode, args.retry_wait_sec, attempt,
                args.num_retries)
    time.sleep(args.retry_wait_sec)


if __name__ == "__main__":
  sys.exit(main())
