"""Microbenchmark of the production GT voxelization path in isolation.

Times `train/gt.py::voxelize_batch_packed_fgbg` (phase-A rasterization →
ops/block_scatter.py → packed fill) on the attached chip with the same
inputs bench.py's headline/heavy variants feed the full train step, so
kernel/phase-A changes can be A/B'd in seconds instead of through a full
step compile. Optionally captures a jax.profiler trace for
tools/trace_summary.py.

Usage:
  python tools/gt_microbench.py --tris 2500            # headline load
  python tools/gt_microbench.py --tris 25000           # heavy load
  python tools/gt_microbench.py --profile /tmp/prof_gt --tris 2500
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--tris", type=int, default=2500)
  p.add_argument("--batch", type=int, default=8)
  p.add_argument("--resolution", type=int, default=128)
  p.add_argument("--steps", type=int, default=30)
  p.add_argument("--windows", type=int, default=5)
  p.add_argument("--warmup", type=int, default=5)
  p.add_argument("--profile", type=str, default=None)
  p.add_argument("--fill", action=argparse.BooleanOptionalAction,
                 default=True, help="include the packed interior fill")
  args = p.parse_args()

  import jax
  jax.config.update("jax_compilation_cache_dir",
                    os.path.join(os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))), ".jax_cache"))
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
  import jax.numpy as jnp

  import bench
  from corenet_tpu.train import gt as gt_lib

  res = (args.resolution,) * 3
  irm, window = 8, 24
  required_max_edge = (window - 4) / irm / max(res)
  inputs = bench._scene_inputs(args.batch, 64, res, args.tris, num_mesh=1,
                               required_max_edge=required_max_edge)
  tris = jnp.asarray(inputs["triangles"])
  slot = jnp.asarray(inputs["tri_mesh_slot"])
  valid = jnp.asarray(inputs["tri_valid"])
  labels = jnp.asarray(inputs["mesh_labels"])
  offsets = jnp.asarray(inputs["grid_offset"])
  print(f"[gt_bench] triangles padded shape {tris.shape}", file=sys.stderr)

  kwargs = dict(resolution=res, image_resolution_multiplier=irm,
                max_bbox_pixels=window, conservative_rasterization=False,
                fill_inside=args.fill)
  assert gt_lib.packed_fgbg_eligible(args.batch, **kwargs)

  @jax.jit
  def run(tris, slot, valid, labels, offsets):
    packed, _ = gt_lib.voxelize_batch_packed_fgbg(
        tris, slot, valid, labels, offsets, **kwargs)
    return packed

  t0 = time.monotonic()
  out = run(tris, slot, valid, labels, offsets)
  out.block_until_ready()
  print(f"[gt_bench] compile+first {time.monotonic() - t0:.1f}s; "
        f"out {out.shape} {out.dtype} popcount-sample "
        f"{int(jnp.sum(out[0] & 1))}", file=sys.stderr)

  for _ in range(args.warmup):
    out = run(tris, slot, valid, labels, offsets)
  out.block_until_ready()

  def window_ms():
    # One tunnel round trip per window: queue all steps, sync once.
    t0 = time.monotonic()
    for _ in range(args.steps):
      o = run(tris, slot, valid, labels, offsets)
    o.block_until_ready()
    return (time.monotonic() - t0) * 1e3 / args.steps

  if args.profile:
    with jax.profiler.trace(args.profile):
      ms = [window_ms() for _ in range(args.windows)]
  else:
    ms = [window_ms() for _ in range(args.windows)]
  med = statistics.median(ms)
  per_scene = med / args.batch
  print(f"[gt_bench] windows ms/step: {['%.2f' % m for m in ms]}",
        file=sys.stderr)
  print(f"tris={tris.shape[1]} batch={args.batch} fill={args.fill} "
        f"median {med:.2f} ms/step = {per_scene:.3f} ms/scene "
        f"({1e3 / per_scene:.1f} scenes/s)")


if __name__ == "__main__":
  main()
