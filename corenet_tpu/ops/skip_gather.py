"""Pallas TPU kernel: the ray-traced skip connection's pixel gather as
one-hot MXU matmuls, with a matmul backward replacing XLA's scatter-add.

The skip connection (models/skip.py; reference
ray_traced_skip_connection.py:53-144) gathers, for every voxel of a
D*H*W grid, one C-channel pixel of a padded 2D feature map. XLA lowers
this to a scalarized gather whose output bf16[B*D*H*W, C] tiles with C
(= 12..24) in the 128-wide lane dimension — profiled at 15.7 ms forward
+ 31.6 ms backward scatter-add per train step at 64^3, the two largest
non-conv costs in the step.

This kernel reformulates the gather so both directions run on the MXU:

  out[n, c] = fmap[u_n, v_n, c]
            = sum_u sum_v rowhot[n, u] * colhot[n, v] * fmap[u, v, c]

Per TILE_N voxel block:
  * colhot^T[v, n] = (v == px[n]) is built by a broadcasted-iota compare;
  * M = fmapX @ colhot^T is ONE standard MXU matmul, where fmapX is the
    feature map pre-arranged as [C*H2p, W2] (u padded into a 128-lane
    group per channel);
  * the row selection is a lane-iota mask + an aligned 128-lane reduce
    (no relayouts: u lives in iota%128 space).
Backward is dfmapX += D @ colhot^T^T with flash-attention-style
((1,),(1,)) contraction dims, accumulated in the revisited output block
— the scatter-add disappears.

The one-hot products are exact (each sum has exactly one nonzero term),
so the forward matches `jnp.take_along_axis` bit-for-bit.

Compiled on TPU; interpret mode elsewhere (tests on the virtual CPU
mesh), same convention as ops/block_scatter.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.sharding import Mesh

from corenet_tpu.parallel import kernel_sharding

TILE_N = 512


def _channel_onehot(h2p, c, dt):
  """E[l, c'] = (l // h2p == c'): contracting with it on l sums each
  channel's single unmasked lane group — an MXU-side "transpose+reduce"
  that lets the kernels produce/consume voxel-major [TN, C] directly
  (the C-major orientation previously cost a full-size XLA relayout of
  every skip tensor, ~5 ms/step in the packed 128³ train step)."""
  return (jax.lax.broadcasted_iota(jnp.int32, (c * h2p, c), 0) // h2p ==
          jax.lax.broadcasted_iota(jnp.int32, (c * h2p, c), 1)).astype(dt)


def _fwd_kernel(px_ref, py_ref, fmap_ref, out_ref, *, h2p, c):
  w2 = fmap_ref.shape[2]
  tn = px_ref.shape[1]
  dt = fmap_ref.dtype
  i = pl.program_id(0)
  v = px_ref[pl.ds(i, 1), :]  # (1, TN) i32
  u = py_ref[pl.ds(i, 1), :]  # (1, TN) i32
  colhot_t = (jax.lax.broadcasted_iota(jnp.int32, (w2, tn), 0) == v)
  # bf16 MXU matmuls accumulate in f32 natively; HIGHEST is only legal
  # (and only needed) for genuine f32 operands.
  prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
  m = jax.lax.dot_general(
      fmap_ref[0], colhot_t.astype(dt), (((1,), (0,)), ((), ())),
      precision=prec,
      preferred_element_type=jnp.float32)  # (C*H2p, TN)
  rowmask = (jax.lax.broadcasted_iota(jnp.int32, (c * h2p, tn), 0)
             % h2p == u)
  masked = jnp.where(rowmask, m, 0.0).astype(dt)
  # (TN, C) via one-hot contraction over l — exactly one nonzero per
  # output element, so still bit-exact.
  out_ref[0] = jax.lax.dot_general(
      masked, _channel_onehot(h2p, c, dt), (((0,), (0,)), ((), ())),
      precision=prec,
      preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_kernel(px_ref, py_ref, dout_ref, dfmap_ref, *, h2p, c):
  w2 = dfmap_ref.shape[2]
  tn = px_ref.shape[1]
  dt = dout_ref.dtype
  i = pl.program_id(0)
  v = px_ref[pl.ds(i, 1), :]
  u = py_ref[pl.ds(i, 1), :]
  colhot_t = (jax.lax.broadcasted_iota(jnp.int32, (w2, tn), 0) == v)
  rowmask = (jax.lax.broadcasted_iota(jnp.int32, (c * h2p, tn), 0)
             % h2p == u)
  prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
  # dout arrives voxel-major (TN, C); expand to (C*H2p, TN) rows via the
  # one-hot contraction (one nonzero per element — exact).
  dexp = jax.lax.dot_general(
      _channel_onehot(h2p, c, dt), dout_ref[0], (((1,), (1,)), ((), ())),
      precision=prec,
      preferred_element_type=jnp.float32).astype(dt)
  d = jnp.where(rowmask, dexp, jnp.zeros((), dt))
  contrib = jax.lax.dot_general(
      d, colhot_t.astype(dt), (((1,), (1,)), ((), ())),
      precision=prec,
      preferred_element_type=jnp.float32)  # (C*H2p, W2)

  @pl.when(pl.program_id(1) == 0)
  def _():
    dfmap_ref[0] = contrib

  @pl.when(pl.program_id(1) > 0)
  def _():
    dfmap_ref[0] += contrib


@functools.lru_cache(maxsize=None)
def _make(b, n, w2, h2p, c, dt_name, interpret):
  dt = jnp.dtype(dt_name)
  nb = n // TILE_N
  fwd_call = pl.pallas_call(
      functools.partial(_fwd_kernel, h2p=h2p, c=c),
      grid=(b, nb),
      in_specs=[
          pl.BlockSpec((b, TILE_N), lambda i, j: (0, j)),
          pl.BlockSpec((b, TILE_N), lambda i, j: (0, j)),
          pl.BlockSpec((1, c * h2p, w2), lambda i, j: (i, 0, 0)),
      ],
      out_specs=pl.BlockSpec((1, TILE_N, c), lambda i, j: (i, j, 0)),
      out_shape=jax.ShapeDtypeStruct((b, n, c), dt),
      interpret=interpret)
  bwd_call = pl.pallas_call(
      functools.partial(_bwd_kernel, h2p=h2p, c=c),
      grid=(b, nb),
      in_specs=[
          pl.BlockSpec((b, TILE_N), lambda i, j: (0, j)),
          pl.BlockSpec((b, TILE_N), lambda i, j: (0, j)),
          pl.BlockSpec((1, TILE_N, c), lambda i, j: (i, j, 0)),
      ],
      out_specs=pl.BlockSpec((1, c * h2p, w2), lambda i, j: (i, 0, 0)),
      out_shape=jax.ShapeDtypeStruct((b, c * h2p, w2), jnp.float32),
      interpret=interpret)

  @jax.custom_vjp
  def gather(fmapx, px, py):
    return fwd_call(px, py, fmapx)

  def fwd(fmapx, px, py):
    return gather(fmapx, px, py), (px, py)

  def bwd(res, dout):
    px, py = res
    dfmap = bwd_call(px, py, dout.astype(dt)).astype(dt)
    return dfmap, None, None

  gather.defvjp(fwd, bwd)
  return jax.jit(gather)


def _gather_local(fmap_padded, px, py, *, interpret):
  """The single-shard gather (see `skip_gather`); batch = local batch."""
  b, h2, w2, c = fmap_padded.shape
  n = px.shape[1]
  h2p = ((h2 + 127) // 128) * 128
  # [B, H2, W2, C] -> [B, C, H2p, W2] -> [B, C*H2p, W2]: u indexes a
  # 128-aligned lane group per channel inside the kernel.
  fmapx = jnp.transpose(fmap_padded, (0, 3, 1, 2))
  fmapx = jnp.pad(fmapx, ((0, 0), (0, 0), (0, h2p - h2), (0, 0)))
  fmapx = fmapx.reshape(b, c * h2p, w2)
  pad_n = (-n) % TILE_N
  if pad_n:
    px = jnp.pad(px, ((0, 0), (0, pad_n)))
    py = jnp.pad(py, ((0, 0), (0, pad_n)))
  gather = _make(b, n + pad_n, w2, h2p, c, fmap_padded.dtype.name,
                 interpret)
  out = gather(fmapx, px.astype(jnp.int32), py.astype(jnp.int32))
  if pad_n:
    out = out[:, :n, :]
  return out


def skip_gather(fmap_padded: jnp.ndarray,   # [B, H2, W2, C] float
                px: jnp.ndarray,            # [B, N] int32, in [0, W2)
                py: jnp.ndarray,            # [B, N] int32, in [0, H2)
                interpret: bool | None = None) -> jnp.ndarray:
  """Gathers fmap_padded[b, py, px, :] for each index pair.

  Returns [B, N, C] in fmap_padded's dtype; differentiable wrt
  fmap_padded (indices get no gradient). On a multi-device pure-data
  mesh the kernel (and its matmul backward) runs per batch shard under
  shard_map (parallel/kernel_sharding.py).
  """
  b = fmap_padded.shape[0]
  if interpret is None:
    interpret = jax.default_backend() != "tpu"
  core = functools.partial(_gather_local, interpret=bool(interpret))
  kernel_sharding.trace_counters["skip_gather"] += 1
  mode = kernel_sharding.kernel_mode(b)
  if isinstance(mode, Mesh):
    return kernel_sharding.map_over_data(core, mode, n_in=3)(
        fmap_padded, px, py)
  return core(fmap_padded, px, py)
