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


class WorkerProgress:
  """Rank-0 operator view of EVERY worker's progress.

  The reference funnels per-worker progress to rank 0 over TensorPipe
  RPC and renders a bar-chart postfix (ui.py:116-231). TPU pods have no
  RPC sidecar and collectives must not carry control-plane chatter, so
  the transport here is a per-host JSON heartbeat file under
  <out>/progress/ (local or gs://): each host `report()`s on a
  throttle; host 0 additionally renders one bar line per worker from
  whatever heartbeats exist. Hosts never block on each other, and a
  crashed/hung worker shows up as a stale heartbeat (age tag) instead
  of stalling the display — strictly better failure visibility than the
  reference's blocking gather.
  """

  def __init__(self, output_dir: str, desc: str = "",
               interval_sec: float = 30.0,
               rank: Optional[int] = None,
               num_ranks: Optional[int] = None,
               log: Optional[logging.Logger] = None):
    if rank is None or num_ranks is None:
      import jax
      rank = jax.process_index() if rank is None else rank
      num_ranks = jax.process_count() if num_ranks is None else num_ranks
    self.rank = rank
    self.num_ranks = num_ranks
    self.desc = desc
    self.interval_sec = interval_sec
    self.log = log or logging.getLogger(__name__)
    self.dir = fs.join(output_dir, "progress")
    fs.makedirs(self.dir)
    self._start = time.time()
    self._last = 0.0

  def _path(self, rank: int) -> str:
    return fs.join(self.dir, f"worker_{rank}.json")

  def report(self, current: int, total: Optional[int] = None,
             note: str = "", force: bool = False) -> None:
    """Heartbeat this worker's position; host 0 also renders the view."""
    now = time.time()
    if not force and now - self._last < self.interval_sec:
      return
    self._last = now
    import json
    rate = current / max(now - self._start, 1e-9)
    fs.write_text(self._path(self.rank), json.dumps({
        "rank": self.rank, "current": int(current),
        "total": None if total is None else int(total),
        "note": note, "time": now, "rate": rate}))
    if self.rank == 0:
      self.render()

  def render(self) -> None:
    """Logs one progress line per worker (host 0's operator view)."""
    import json
    now = time.time()
    lines = []
    for r in range(self.num_ranks):
      try:
        rec = json.loads(fs.read_text(self._path(r)))
      except Exception:
        lines.append(f"W{r} |{_bar(0.0)}| (no heartbeat)")
        continue
      cur, total = rec.get("current", 0), rec.get("total")
      age = now - rec.get("time", now)
      stale = f" STALE {int(age)}s" if age > 3 * self.interval_sec else ""
      note = f" {rec['note']}" if rec.get("note") else ""
      if total:
        lines.append(f"W{r} |{_bar(cur / total)}| {cur}/{total} "
                     f"({rec.get('rate', 0.0):.2f}/s){note}{stale}")
      else:
        lines.append(f"W{r} {cur} ({rec.get('rate', 0.0):.2f}/s)"
                     f"{note}{stale}")
    self.log.info("%s workers:\n  %s", self.desc, "\n  ".join(lines))
