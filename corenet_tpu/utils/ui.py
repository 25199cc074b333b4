"""Progress reporting and logging for (multi-host) runs.

The reference funnels per-worker progress and log records to rank 0 over
TensorPipe RPC (/root/reference/src/corenet/ui.py:116-247). TPU pods have
no RPC sidecar and collectives should not carry control-plane chatter
(SURVEY §5), so the TPU-native design is host-local: every process logs
to its own file under <out>/logs/ with the same rank-tagged format
(`I<ts> W:<rank> file:line]`), process 0 also logs to the console, and
progress renders as non-TTY-safe rate lines (periodic prints, like the
reference's TqdmSafe fallback) with a per-host unicode bar.
"""

from __future__ import annotations

import datetime
import logging
import sys
import time
from typing import Iterable, Iterator, Optional

from corenet_tpu.utils import fs

_BLOCKS = " ▏▎▍▌▋▊▉█"


def _bar(fraction: float, width: int = 10) -> str:
  fraction = min(max(fraction, 0.0), 1.0)
  cells = fraction * width
  full = int(cells)
  frac = int((cells - full) * (len(_BLOCKS) - 1))
  return ("█" * full + (_BLOCKS[frac] if full < width else "") +
          " " * (width - full - 1))[:width]


class _RankFormatter(logging.Formatter):
  def __init__(self, rank: int):
    super().__init__()
    self.rank = rank

  def format(self, record: logging.LogRecord) -> str:
    ts = datetime.datetime.fromtimestamp(record.created)
    prefix = (f"{record.levelname[0]}{ts:%m%d %H:%M:%S}."
              f"{int(record.msecs):03d} W:{self.rank} "
              f"{record.filename}:{record.lineno}]")
    return f"{prefix} {record.getMessage()}"


def initialize_logging(output_dir: Optional[str] = None,
                       rank: Optional[int] = None,
                       level=logging.INFO) -> None:
  """Rank-tagged logging: per-process file + console on process 0."""
  if rank is None:
    try:
      import jax
      rank = jax.process_index()
    except Exception:  # pragma: no cover
      rank = 0
  root = logging.getLogger()
  root.setLevel(level)
  root.handlers.clear()
  formatter = _RankFormatter(rank)
  if rank == 0:
    console = logging.StreamHandler(sys.stderr)
    console.setFormatter(formatter)
    root.addHandler(console)
  if output_dir:
    fs.makedirs(fs.join(output_dir, "logs"))
    fh = logging.FileHandler(
        fs.join(output_dir, "logs", f"worker_{rank}.log"))
    fh.setFormatter(formatter)
    root.addHandler(fh)


class Progress:
  """Non-TTY-safe progress: one line every `interval_sec` seconds.

  Wraps an iterable like the reference's DistributedProgress wraps the
  eval loader (ui.py:167-190) — per-host, printed locally.
  """

  def __init__(self, iterable: Iterable, total: Optional[int] = None,
               desc: str = "", interval_sec: float = 10.0,
               log: Optional[logging.Logger] = None):
    self.iterable = iterable
    self.total = total if total is not None else _try_len(iterable)
    self.desc = desc
    self.interval_sec = interval_sec
    self.log = log or logging.getLogger(__name__)

  def __iter__(self) -> Iterator:
    start = time.time()
    last = start
    for i, item in enumerate(self.iterable):
      yield item
      now = time.time()
      if now - last >= self.interval_sec:
        last = now
        rate = (i + 1) / max(now - start, 1e-9)
        if self.total:
          frac = (i + 1) / self.total
          eta = (self.total - i - 1) / max(rate, 1e-9)
          self.log.info("%s |%s| %d/%d (%.1f/s, eta %ds)", self.desc,
                        _bar(frac), i + 1, self.total, rate, int(eta))
        else:
          self.log.info("%s %d (%.1f/s)", self.desc, i + 1, rate)


def _try_len(iterable) -> Optional[int]:
  try:
    return len(iterable)
  except TypeError:
    return None
