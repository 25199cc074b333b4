"""Pallas TPU kernel for the FG_BG soft-IoU loss sums.

The binary iou_fgbg loss (models/losses.py; reference losses.py:64-114)
needs only two per-scene scalars from the 128^3 = 2M-voxel grids:

  inter[b] = sum_{gt=1} sigmoid(diff)          (min(gt, pred) sum)
  union[b] = sum_{gt=1} 1 + sum_{gt=0} sigmoid(diff)   (max sum)

with diff = logits[..., 1] - logits[..., 0]. XLA's lowering materializes
the f32 sigmoid/min/max tensors at 128^3 and reduces them in separate
fusions — ~21 ms/step profiled. This kernel streams bf16 diff + int gt
once, accumulating per-lane f32 partials in a revisited output block;
the full-grid iou math then runs on [B]-sized vectors.

The backward needs no kernel at all: d diff = s'(diff) * (gt ? d_inter
: d_union) is a single elementwise XLA pass (custom VJP below).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.sharding import Mesh

from corenet_tpu.parallel import kernel_sharding

MAX_TILE = 2048  # rows of 128 lanes per step (512 KB bf16 + 1 MB int32)


def _sums_kernel(diff_ref, gt_ref, out_ref):
  tile = diff_ref.shape[1]

  @pl.when(pl.program_id(1) == 0)
  def _():
    out_ref[0] = jnp.zeros_like(out_ref[0])

  pred = jax.nn.sigmoid(diff_ref[0].astype(jnp.float32))
  gt = gt_ref[0]
  if jnp.issubdtype(gt.dtype, jnp.floating):
    # Float labels (the bf16 phased-GT kernel output — exact 0/1).
    fg = gt == jnp.asarray(1, gt.dtype)
  else:
    # Widen narrow int labels before comparing: Mosaic has no i8 vector
    # compare ("Target does not support this comparison").
    if gt.dtype.itemsize < 4:
      gt = gt.astype(jnp.int32)
    fg = gt == 1
  inter = jnp.where(fg, pred, 0.0)
  union = jnp.where(fg, 1.0, pred)
  inter8 = inter.reshape(tile // 8, 8, 128).sum(axis=0)
  union8 = union.reshape(tile // 8, 8, 128).sum(axis=0)
  out_ref[0, :, 0:128] += inter8
  out_ref[0, :, 128:256] += union8


@functools.lru_cache(maxsize=None)
def _make(b, rows, tile, interpret):
  nb = rows // tile
  return pl.pallas_call(
      _sums_kernel,
      grid=(b, nb),
      in_specs=[
          pl.BlockSpec((1, tile, 128), lambda i, j: (i, j, 0)),
          pl.BlockSpec((1, tile, 128), lambda i, j: (i, j, 0)),
      ],
      out_specs=pl.BlockSpec((1, 8, 256), lambda i, j: (i, 0, 0)),
      out_shape=jax.ShapeDtypeStruct((b, 8, 256), jnp.float32),
      interpret=interpret)


@functools.lru_cache(maxsize=None)
def _make_fn(b, n, dt_name, gt_name, interpret):
  """Returns the custom-vjp (diff, gt) -> (inter[b], union[b]) fn."""
  rows = n // 128
  tile = next(t for t in range(min(MAX_TILE, rows), 0, -8)
              if rows % t == 0)
  call = _make(b, rows, tile, interpret)

  @jax.custom_vjp
  def sums(diff, gt):
    part = call(diff.reshape(b, rows, 128), gt.reshape(b, rows, 128))
    inter = part[:, :, 0:128].sum(axis=(1, 2))
    union = part[:, :, 128:256].sum(axis=(1, 2))
    return inter, union

  def fwd(diff, gt):
    return sums(diff, gt), (diff, gt)

  def bwd(res, ct):
    diff, gt = res
    d_inter, d_union = ct
    shape = (b,) + (1,) * (diff.ndim - 1)
    s = jax.nn.sigmoid(diff.astype(jnp.float32))
    sel = jnp.where(gt == 1, d_inter.reshape(shape), d_union.reshape(shape))
    ddiff = (sel * s * (1.0 - s)).astype(diff.dtype)
    return ddiff, None

  sums.defvjp(fwd, bwd)
  return sums


def fgbg_sums(diff: jnp.ndarray,   # float[B, ...] logit differences
              gt: jnp.ndarray,     # int[B, ...] labels (1 = foreground)
              interpret: bool | None = None):
  """Per-scene (intersection, union) soft-IoU sums; differentiable in
  diff. Requires the per-scene element count to be a multiple of
  TILE*128 (true for 32^3+ grids).

  On a multi-device mesh the kernel runs per shard under shard_map
  (parallel/kernel_sharding.py): batch over 'data', and the voxel
  dimension (dim 1) over a non-trivial 'space' axis — each device
  reduces its voxel shard and the per-scene partials are psum'd over
  'space' in-body. The returned [B] vectors stay 'data'-sharded and the
  caller's mean reduces them with XLA collectives.
  """
  b = diff.shape[0]
  n = diff.size // b
  assert n % (8 * 128) == 0, n
  if interpret is None:
    interpret = jax.default_backend() != "tpu"

  def call(d, g):
    # Voxel count from the LOCAL shard: under 'space' sharding each
    # device reduces n / space voxels.
    fn = _make_fn(d.shape[0], d.size // d.shape[0], d.dtype.name,
                  g.dtype.name, bool(interpret))
    return fn(d, g)

  kernel_sharding.trace_counters["fgbg"] += 1
  mode = _mode_for(b, diff.shape[1], n)
  if isinstance(mode, Mesh):
    if mode.shape.get("space", 1) > 1:
      from jax.sharding import PartitionSpec as P

      def call_space(d, g):
        inter, union = call(d, g)
        return (jax.lax.psum(inter, "space"),
                jax.lax.psum(union, "space"))

      return kernel_sharding.map_with_specs(
          call_space, mode,
          in_specs=(P("data", "space"), P("data", "space")),
          out_specs=(P("data"), P("data")))(diff, gt)
    return kernel_sharding.map_over_data(call, mode, n_in=2,
                                         n_out=2)(diff, gt)
  return call(diff, gt)


def _mode_for(b, dim1, n):
  """kernel_mode with fgbg's 'space' eligibility: the voxel axis (dim 1)
  must divide over 'space' AND each shard's element count must stay a
  multiple of 8*128 (the kernel's row contract)."""
  mode = kernel_sharding.kernel_mode(b, n=dim1, allow_space=True)
  if isinstance(mode, Mesh):
    sp = mode.shape.get("space", 1)
    if sp > 1 and (n // sp) % (8 * 128):
      return None
  return mode


def use_fgbg_kernel(logits: jnp.ndarray, weights) -> bool:
  b = logits.shape[0]
  n = logits.size // b // logits.shape[-1]
  # Multi-device: under a registered mesh the kernel shard_maps over
  # 'data' (per batch shard) and, when eligible, over 'space' too (per
  # voxel shard with psum'd partial sums).
  return (weights is None and logits.shape[-1] == 2
          and n % (8 * 128) == 0
          and kernel_sharding.backend_ok()
          and _mode_for(b, logits.shape[1], n) is not None)
