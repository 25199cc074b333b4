"""ctypes bindings + lazy build of the native C++ ops.

Replaces the reference's torch cpp_extension JIT pipeline
(/root/reference/src/corenet/cc/fill_voxels.py:75-111): the shared library
builds on first use (cmake+ninja when available, plain g++ otherwise) into
a cache dir, or loads a precompiled path from
$CORENET_PRECOMPILED_CC_LIBRARY. In multi-process runs only process 0
builds; others poll for the artifact (the reference's
rank-0-compiles-then-barrier protocol, pipeline.py:93-99).
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import time
from typing import Optional

import numpy as np

_CC_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB: Optional[ctypes.CDLL] = None


def _build(out_dir: str) -> str:
  os.makedirs(out_dir, exist_ok=True)
  lib_path = os.path.join(out_dir, "libcorenet_cc.so")
  sources = [os.path.join(_CC_DIR, f)
             for f in ("fill_voxels.cc", "voxelize.cc")]
  newest_src = max(os.path.getmtime(s) for s in sources)
  if os.path.exists(lib_path) and os.path.getmtime(lib_path) >= newest_src:
    return lib_path

  if shutil.which("cmake") and shutil.which("ninja"):
    build_dir = os.path.join(out_dir, "build")
    os.makedirs(build_dir, exist_ok=True)
    subprocess.run(["cmake", "-G", "Ninja", _CC_DIR,
                    "-DCMAKE_BUILD_TYPE=Release"],
                   cwd=build_dir, check=True, capture_output=True)
    subprocess.run(["ninja"], cwd=build_dir, check=True,
                   capture_output=True)
    built = os.path.join(build_dir, "libcorenet_cc.so")
  else:  # pragma: no cover - fallback toolchain
    built = lib_path + ".tmp"
    subprocess.run(["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                    "-fPIC", "-pthread", "-o", built] + sources,
                   check=True, capture_output=True)
  os.replace(built, lib_path)
  return lib_path


def load_library() -> ctypes.CDLL:
  global _LIB
  if _LIB is not None:
    return _LIB
  pre = os.environ.get("CORENET_PRECOMPILED_CC_LIBRARY")
  if pre:
    _LIB = ctypes.CDLL(pre)
    return _LIB

  cache = os.environ.get(
      "CORENET_CC_CACHE",
      os.path.join(os.path.expanduser("~"), ".cache", "corenet_tpu_cc"))
  lib_path = os.path.join(cache, "libcorenet_cc.so")

  is_builder = True
  try:
    import jax
    is_builder = jax.process_index() == 0
  except Exception:
    pass
  if is_builder:
    lib_path = _build(cache)
  else:  # poll for the builder's artifact
    for _ in range(600):
      if os.path.exists(lib_path):
        break
      time.sleep(0.5)
  _LIB = ctypes.CDLL(lib_path)
  return _LIB


def fill_inside_voxels(grid: np.ndarray) -> np.ndarray:
  """Native flood fill; numeric[N, D, H, W] → binary grid, same dtype."""
  lib = load_library()
  assert grid.ndim == 4
  n, d, h, w = grid.shape
  if grid.dtype == np.uint8:
    out = np.ascontiguousarray(grid.copy())
    fn = lib.corenet_fill_inside_voxels_u8
    ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
  elif grid.dtype == np.int32:
    out = np.ascontiguousarray(grid.copy())
    fn = lib.corenet_fill_inside_voxels_i32
    ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
  else:
    out = np.ascontiguousarray(grid.astype(np.float32))
    fn = lib.corenet_fill_inside_voxels_f32
    ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
  fn.argtypes = [type(ptr), ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                 ctypes.c_int64]
  fn(ptr, n, d, h, w)
  return out.astype(grid.dtype) if out.dtype != grid.dtype else out


def voxelize_triangles(triangles: np.ndarray,
                       tri_mesh_index: np.ndarray,
                       num_meshes: int,
                       resolution,
                       image_resolution_multiplier: float = 4,
                       conservative_rasterization: bool = False,
                       projection_depth_multiplier: float = 1,
                       sub_grid_sampling: bool = False) -> np.ndarray:
  """Native voxelizer. Triangles must already be in voxel space.

  Args mirror voxel.voxelize_triangles; returns float32[M, D', H', W'].
  """
  lib = load_library()
  d, h, w = (int(v) for v in resolution)
  image_res = int(round(max(w, h, d * projection_depth_multiplier) *
                        image_resolution_multiplier))
  if sub_grid_sampling:
    out_shape = (num_meshes, 2 * d + 1, 2 * h + 1, 2 * w + 1)
    sub = int(image_resolution_multiplier)
    assert sub % 2 == 1
  else:
    out_shape = (num_meshes, d, h, w)
    sub = -1
  out = np.zeros(out_shape, np.float32)
  triangles = np.ascontiguousarray(triangles, np.float32)
  tri_mesh_index = np.ascontiguousarray(tri_mesh_index, np.int32)

  fn = lib.corenet_voxelize_triangles
  fn.argtypes = [
      ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
      ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
      ctypes.c_int64, ctypes.c_int, ctypes.c_double, ctypes.c_int,
      ctypes.c_int, ctypes.POINTER(ctypes.c_float),
  ]
  fn(triangles.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
     tri_mesh_index.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
     triangles.shape[0], num_meshes, d, h, w, image_res,
     float(projection_depth_multiplier),
     int(conservative_rasterization), sub,
     out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
  return out
