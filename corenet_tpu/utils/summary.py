"""Scalar/image summary writing: TensorBoard when available, JSONL always.

Covers the reference's TensorBoard usage (train loss scalars, per-class
eval metrics, qualitative images — pipeline.py:236-239,
evaluation_results.py:213-238) without hard-depending on the tensorboard
package: scalars/images go to a JSONL event file (and PNGs) per writer,
and mirrored to TensorBoard if `torch.utils.tensorboard` imports.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

from corenet_tpu.utils import fs


def _try_tensorboard(log_dir: str):
  try:
    from torch.utils.tensorboard import SummaryWriter  # type: ignore
    return SummaryWriter(log_dir=log_dir)
  except Exception:  # pragma: no cover - optional dependency
    return None


class SummaryWriter:
  """Append-only scalar/image summaries under a log dir."""

  def __init__(self, log_dir: str, use_tensorboard: bool = True):
    self.log_dir = log_dir
    fs.makedirs(log_dir)
    self._jsonl_path = fs.join(log_dir, "scalars.jsonl")
    self._buffer = []
    self._tb = _try_tensorboard(log_dir) if use_tensorboard else None

  def add_scalar(self, tag: str, value: float, global_step: int):
    self._buffer.append(json.dumps({
        "tag": tag, "value": float(value), "step": int(global_step),
        "time": time.time()}))
    if self._tb is not None:
      self._tb.add_scalar(tag, value, global_step)

  def add_image(self, tag: str, image: np.ndarray, global_step: int):
    """image: uint8[H, W, 3]."""
    safe_tag = tag.replace("/", "_")
    path = fs.join(self.log_dir, f"{safe_tag}_{global_step}.png")
    try:
      import PIL.Image  # type: ignore
      import io as _io
      buf = _io.BytesIO()
      PIL.Image.fromarray(image).save(buf, format="PNG")
      fs.write_bytes(path, buf.getvalue())
    except ImportError:  # pragma: no cover
      np.save(path + ".npy", image)
    if self._tb is not None:
      self._tb.add_image(tag, image, global_step, dataformats="HWC")

  def flush(self):
    if self._buffer:
      mode = "a" if os.path.exists(self._jsonl_path) else "w"
      with open(self._jsonl_path, mode) as f:
        f.write("\n".join(self._buffer) + "\n")
      self._buffer = []
    if self._tb is not None:
      self._tb.flush()

  def close(self):
    self.flush()
    if self._tb is not None:
      self._tb.close()
