"""Debugging helpers (the role of the reference's debug_helpers.py:
compact tensor display + quick image dumping for interactive debugging).
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np


def array_summary(x: Any) -> str:
  """Compact one-line description of an array-like."""
  try:
    a = np.asarray(x)
  except Exception:
    return repr(x)
  if a.size == 0:
    return f"{a.dtype}{list(a.shape)} (empty)"
  if a.dtype == bool:
    return f"bool{list(a.shape)} true={int(a.sum())}/{a.size}"
  if np.issubdtype(a.dtype, np.floating):
    finite = np.isfinite(a)
    extra = "" if finite.all() else f" nonfinite={int((~finite).sum())}"
    af = a[finite] if not finite.all() else a
    if af.size == 0:
      return f"{a.dtype}{list(a.shape)} all-nonfinite"
    return (f"{a.dtype}{list(a.shape)} μ={af.mean():.4g} σ={af.std():.4g} "
            f"[{af.min():.4g}, {af.max():.4g}]{extra}")
  return f"{a.dtype}{list(a.shape)} [{a.min()}, {a.max()}]"


def install_compact_array_repr() -> None:
  """Replaces jax.Array debugger repr with the compact summary (the role
  of debug_helpers.better_tensor_display)."""
  import jax
  jax.Array.__repr__ = lambda self: f"Array<{array_summary(self)}>"  # type: ignore


def save_debug_image(image: np.ndarray, path: str = "/tmp/debug.png") -> str:
  """Dumps an array as a PNG for quick inspection; returns the path."""
  a = np.asarray(image)
  if a.dtype != np.uint8:
    lo, hi = float(a.min()), float(a.max())
    a = ((a - lo) / (hi - lo + 1e-12) * 255).astype(np.uint8)
  if a.ndim == 2:
    a = np.stack([a] * 3, -1)
  import PIL.Image
  os.makedirs(os.path.dirname(path), exist_ok=True)
  PIL.Image.fromarray(a).save(path)
  return path
