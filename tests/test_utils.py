"""Infra utility tests: dataclass flags, shard ranges, step events, fs."""

import dataclasses
import os
from typing import List

import numpy as np
import numpy.testing as tt
import pytest

from corenet_tpu.data.loader import distributed_indices
from corenet_tpu.eval.pipeline import shard_range
from corenet_tpu.utils import flags, fs, misc
from corenet_tpu.utils.summary import SummaryWriter


@dataclasses.dataclass
class _Args:
  config_path: str = flags.flag("path")
  count: int = flags.flag("count", default=3)
  verbose: bool = flags.flag("verbose", default=True)
  define: List[str] = flags.flag("defs", default=[], short_name="D",
                                 repeated=True)


def test_flags_parsing():
  args = flags.parse_flags(_Args, ["--config_path=x.json5", "--count", "7",
                                   "-D", "a=1", "-D", "b=2"])
  assert args.config_path == "x.json5"
  assert args.count == 7 and args.verbose is True
  assert args.define == ["a=1", "b=2"]

  # --no<name> negative for bools; defaults for repeated flags.
  args = flags.parse_flags(_Args, ["--config_path=y", "--noverbose"])
  assert args.verbose is False and args.define == []

  with pytest.raises(SystemExit):
    flags.parse_flags(_Args, [])  # missing required config_path


def test_step_event_semantics():
  ev = misc.StepEvent(start_step=100, interval=50)
  # Fires when crossing start and each interval, in (prev, next].
  assert not ev.trigger(0, 99)
  assert ev.trigger(99, 101)
  assert not ev.trigger(101, 149)
  assert ev.trigger(149, 151)
  assert ev.trigger(199, 260)  # crosses 200 and 250 → fires (once)


def test_shard_range_eval():
  # No duplication, full coverage, contiguous.
  spans = [shard_range(10, 3, s) for s in range(3)]
  assert spans == [(0, 4), (4, 8), (8, 10)]


def test_distributed_indices():
  train = [distributed_indices(10, 3, s, pad_data=True, shuffle=False)
           for s in range(3)]
  assert all(len(t) == 4 for t in train)  # equal sizes (wrap-padded)
  flat = np.concatenate(train)
  assert set(flat) == set(range(10))
  ev = [distributed_indices(10, 3, s, pad_data=False, shuffle=False)
        for s in range(3)]
  assert sum(len(e) for e in ev) == 10  # no duplication for eval
  # Seeded permutation is deterministic.
  a = distributed_indices(10, 2, 0, pad_data=True)
  b = distributed_indices(10, 2, 0, pad_data=True)
  tt.assert_array_equal(a, b)


def test_fs_glob_and_atomic_rename(tmp_path):
  p = str(tmp_path)
  fs.write_text(fs.join(p, "state_000000005.cpt"), "a")
  fs.write_text(fs.join(p, "state_000000010.cpt"), "b")
  got = fs.glob_pattern(fs.join(p, "state_*.cpt"))
  assert [fs.basename(g) for g in got] == ["state_000000005.cpt",
                                           "state_000000010.cpt"]
  fs.rename(got[0], fs.join(p, "renamed.cpt"))
  assert fs.read_text(fs.join(p, "renamed.cpt")) == "a"
  with pytest.raises(ValueError):
    fs.rename(fs.join(p, "renamed.cpt"), "gs://bucket/x")


def test_summary_writer_jsonl(tmp_path):
  w = SummaryWriter(str(tmp_path), use_tensorboard=False)
  w.add_scalar("loss", 1.5, 10)
  w.add_scalar("loss", 1.2, 20)
  w.add_image("img", np.zeros((4, 4, 3), np.uint8), 10)
  w.flush()
  import json
  lines = [json.loads(line) for line in
           open(os.path.join(str(tmp_path), "scalars.jsonl"))]
  assert [(l["tag"], l["value"], l["step"]) for l in lines] == [
      ("loss", 1.5, 10), ("loss", 1.2, 20)]
  assert os.path.exists(os.path.join(str(tmp_path), "img_10.png"))


def test_progress_wrapper():
  from corenet_tpu.utils.ui import Progress
  items = list(Progress(range(5), desc="t", interval_sec=0.0))
  assert items == [0, 1, 2, 3, 4]


def test_worker_progress_funnel(tmp_path, caplog):
  """Rank 0 renders every worker's heartbeat (the reference's per-worker
  progress funnel, ui.py:116-231, as heartbeat files): bars for live
  workers, a no-heartbeat marker for missing ones."""
  import logging
  from corenet_tpu.utils.ui import WorkerProgress
  w1 = WorkerProgress(str(tmp_path), desc="train", interval_sec=0.0,
                      rank=1, num_ranks=3)
  w1.report(50, 100, note="epoch 2")
  w0 = WorkerProgress(str(tmp_path), desc="train", interval_sec=0.0,
                      rank=0, num_ranks=3)
  with caplog.at_level(logging.INFO):
    w0.report(10, 100)
  text = caplog.text
  assert "W0" in text and "10/100" in text
  assert "W1" in text and "50/100" in text and "epoch 2" in text
  assert "W2" in text and "no heartbeat" in text
