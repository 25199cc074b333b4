"""Persistent XLA compilation cache plumbing for the production CLIs.

The production train step cold-compiles in ~10 minutes on a TPU v5e
(BENCH_r04: "compile+first step 579.3s"); with the persistent cache warm
it compiles in well under 2 minutes. The reference's recovery model is
restart-from-last-checkpoint after a ~90 s wait
(/root/reference/src/dist_launch.py:67-105) — that story is only cheap
if a restarted worker does not pay the cold compile again, so every CLI
entry point enables the cache by default (bench.py has done this since
round 3; this module gives `cli/train.py` and `cli/eval.py` the same
behavior).

The default cache location is a machine-local per-user directory rather
than the job's output_path: output_path is frequently a gs:// bucket
(where cache round trips can cost more than they save on flaky links),
and a local cache is shared across jobs, so a re-launched job with the
same model shapes hits even when its output path is new.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

DISABLED = "none"


def default_cache_dir() -> str:
  base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
  return os.path.join(base, "corenet_tpu", "jax_cache")


def enable_compilation_cache(cache_dir: str = "") -> str | None:
  """Points JAX's persistent compilation cache at `cache_dir`.

  `cache_dir` semantics: "" → the per-user default; the literal "none"
  disables the cache entirely. Returns the directory actually used, or
  None when disabled. Must run before the first compile; safe to call
  before or after backend initialization.
  """
  if cache_dir == DISABLED:
    return None
  import jax

  resolved = cache_dir or default_cache_dir()
  if not resolved.startswith("gs://"):
    os.makedirs(resolved, exist_ok=True)
  jax.config.update("jax_compilation_cache_dir", resolved)
  # The production step takes minutes to compile; 2 s keeps everything
  # non-trivial (incl. the eval forward) while skipping tiny throwaways.
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
  log.info("persistent compilation cache at %s", resolved)
  return resolved
