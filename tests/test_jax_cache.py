"""Persistent-compilation-cache plumbing (VERDICT r4 #3).

The production CLIs must enable JAX's persistent compilation cache so a
launcher retry (restart-from-checkpoint, reference dist_launch.py:67-105)
does not pay the ~10-minute cold compile of the train step again."""

import dataclasses

import jax

from corenet_tpu.utils import flags
from corenet_tpu.utils.jax_cache import (DISABLED, default_cache_dir,
                                         enable_compilation_cache)


def test_enable_sets_jax_config(tmp_path, monkeypatch):
  cache = str(tmp_path / "cache")
  used = enable_compilation_cache(cache)
  assert used == cache
  assert jax.config.jax_compilation_cache_dir == cache
  assert (tmp_path / "cache").is_dir()
  assert jax.config.jax_persistent_cache_min_compile_time_secs == 2


def test_default_dir_is_per_user(monkeypatch, tmp_path):
  monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
  assert default_cache_dir() == str(tmp_path / "corenet_tpu" / "jax_cache")
  used = enable_compilation_cache("")
  assert used == default_cache_dir()
  assert (tmp_path / "corenet_tpu" / "jax_cache").is_dir()


def test_none_disables():
  before = jax.config.jax_compilation_cache_dir
  assert enable_compilation_cache(DISABLED) is None
  assert jax.config.jax_compilation_cache_dir == before


def test_cli_flags_expose_cache_dir():
  """Every production entry point carries the flag (plumb-through)."""
  from corenet_tpu.cli import eval as eval_cli
  from corenet_tpu.cli import tf_model_eval, train
  for mod in (train, eval_cli, tf_model_eval):
    fields = {f.name for f in dataclasses.fields(mod.ProgramArgs)}
    assert "compilation_cache_dir" in fields, mod.__name__
  # The flag parses from argv like any other.
  args = flags.parse_flags(
      train.ProgramArgs,
      ["--config_path=x.json5", "--compilation_cache_dir=/tmp/c"])
  assert args.compilation_cache_dir == "/tmp/c"
