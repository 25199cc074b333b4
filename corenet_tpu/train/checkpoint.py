"""Checkpoint store: whole-state bytes with temp/persistent tiers.

Capability parity with the reference's state encoding + CheckpointManager
(/root/reference/src/corenet/state.py:74-97,
/root/reference/src/corenet/cpt_manager.py:90-135):

* A checkpoint is ONE file carrying everything needed to resume or eval:
  global step, the full original config as `extra_metadata` (JSON), and
  the complete state pytree (params + batch stats + Adam moments) as flax
  msgpack — torch.save's role, without pickle.
* Two tiers: `cpt/temp/` (rolling, last `keep_temp` kept) and
  `cpt/persistent/` (kept forever). Filenames `state_{step:09d}.cpt`.
* Atomic write-then-rename; only the designated writer host writes, other
  hosts read after a barrier (the pipeline handles the barrier).

File layout: MAGIC, u64-LE header length, JSON header
{"global_step", "extra_metadata"}, flax-msgpack body of
{"params", "batch_stats", "opt_state"}.
"""

from __future__ import annotations

import json
import struct
from typing import Any, List, Mapping, Optional, Tuple

import flax.serialization
import jax
import jax.numpy as jnp

from corenet_tpu.train.state import TrainState
from corenet_tpu.utils import fs

_MAGIC = b"CORENET-TPU-CPT1"


def encode_state(state: TrainState,
                 extra_metadata: Optional[Mapping[str, Any]] = None) -> bytes:
  header = json.dumps({
      "global_step": int(state.global_step),
      "extra_metadata": dict(extra_metadata or {}),
  }).encode("utf-8")
  body = flax.serialization.to_bytes({
      "params": state.params,
      "batch_stats": state.batch_stats,
      "opt_state": state.opt_state,
  })
  return _MAGIC + struct.pack("<Q", len(header)) + header + body


def decode_state(data: bytes, target: Optional[TrainState] = None
                 ) -> Tuple[TrainState, Mapping[str, Any]]:
  """Decodes checkpoint bytes.

  Args:
    data: Bytes produced by encode_state.
    target: Optional template TrainState; when given, the restored pytree
      has exactly the template's structure/dtypes (flax from_bytes).
      Without it, raw nested dicts of numpy arrays are returned in the
      TrainState fields.

  Returns:
    (state, extra_metadata)
  """
  assert data[:len(_MAGIC)] == _MAGIC, "Not a corenet-tpu checkpoint"
  off = len(_MAGIC)
  (hlen,) = struct.unpack("<Q", data[off:off + 8])
  off += 8
  header = json.loads(data[off:off + hlen].decode("utf-8"))
  body = data[off + hlen:]

  if target is not None:
    tree = flax.serialization.from_bytes({
        "params": target.params,
        "batch_stats": target.batch_stats,
        "opt_state": target.opt_state,
    }, body)
  else:
    tree = flax.serialization.msgpack_restore(body)

  state = TrainState(
      global_step=jnp.asarray(header["global_step"], jnp.int32),
      params=tree["params"],
      batch_stats=tree["batch_stats"],
      opt_state=tree["opt_state"])
  return state, header["extra_metadata"]


def _step_of(path: str) -> int:
  name = fs.basename(path)
  return int(name[len("state_"):-len(".cpt")])


class CheckpointReader:
  """Read-only view over a checkpoint directory tree."""

  def __init__(self, cpt_dir: str):
    self.cpt_dir = cpt_dir
    self.temp_dir = fs.join(cpt_dir, "temp")
    self.persistent_dir = fs.join(cpt_dir, "persistent")

  def list_checkpoints(self) -> List[str]:
    """All checkpoint paths, sorted by step (temp + persistent)."""
    paths = (fs.glob_pattern(fs.join(self.temp_dir, "state_*.cpt")) +
             fs.glob_pattern(fs.join(self.persistent_dir, "state_*.cpt")))
    return sorted(set(paths), key=_step_of)

  def last_checkpoint_path(self) -> Optional[str]:
    paths = self.list_checkpoints()
    return paths[-1] if paths else None

  def read_last_checkpoint(self, target: Optional[TrainState] = None):
    path = self.last_checkpoint_path()
    if path is None:
      return None
    state, meta = decode_state(fs.read_bytes(path), target)
    return state, meta, path


class CheckpointManager(CheckpointReader):
  """Writer: rolling temp checkpoints + forever-kept persistent ones."""

  def __init__(self, cpt_dir: str, keep_temp: int = 5):
    super().__init__(cpt_dir)
    self.keep_temp = keep_temp
    fs.makedirs(self.temp_dir)
    fs.makedirs(self.persistent_dir)

  def save_state(self, state: TrainState,
                 extra_metadata: Optional[Mapping[str, Any]] = None,
                 persistent: bool = False) -> str:
    state = jax.device_get(state)
    data = encode_state(state, extra_metadata)
    step = int(state.global_step)
    out_dir = self.persistent_dir if persistent else self.temp_dir
    final = fs.join(out_dir, f"state_{step:09d}.cpt")
    tmp = final + ".tmp"
    fs.write_bytes(tmp, data)
    fs.rename(tmp, final)
    if not persistent:
      self._prune_temp()
    return final

  def _prune_temp(self):
    paths = sorted(fs.glob_pattern(fs.join(self.temp_dir, "state_*.cpt")),
                   key=_step_of)
    for p in paths[:-self.keep_temp]:
      fs.unlink(p)
