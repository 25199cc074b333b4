"""Pallas TPU kernel: the ray-traced skip connection's pixel gather as
one-hot MXU matmuls, with a matmul backward replacing XLA's scatter-add.

The skip connection (models/skip.py; reference
ray_traced_skip_connection.py:53-144) gathers, for every voxel of a
D*H*W grid, one C-channel pixel of a padded 2D feature map. XLA lowers
this to a scalarized gather whose output bf16[B*D*H*W, C] tiles with C
(= 12..24) in the 128-wide lane dimension — profiled at 15.7 ms forward
+ 31.6 ms backward scatter-add per train step at 64^3, the two largest
non-conv costs in the step.

Forward, per TILE_N voxel block (voxel-major [TN, C] output, ONE
matmul, no relayouts anywhere):

  * the feature map is pre-arranged [C*G, H2p] where G is W2 rounded up
    to a multiple of 8 — each channel's image row in a sublane-aligned
    group, image rows u in lanes;
  * rowhot_t[u, n] = (u == py[n]) gathers whole image rows in one
    full-K matmul: rows_t = fmapx @ rowhot_t -> [C*G, TN]
    (K = H2p, a multiple of 128 — no contraction padding waste; the
    output lane count C*G stays near C*W2, not C*128);
  * the column select is one fused multiply-reduce over the free
    sublane split [C, G, TN] (G % 8 == 0) with a [G, TN] one-hot of
    px[n] broadcast over C, and the [C, TN] result is turned
    voxel-major by the transpose unit.
  Earlier variants measured on chip: C-major output (one matmul but a
  ~6.7 ms/step XLA relayout chain on every skip tensor); a second
  one-hot compaction matmul (doubles MXU work); a 128-lane group +
  in-kernel lane-group reduce (the [TN, C, 128] reshape is a full
  per-tile relayout, 2.5x slower than the matmul it replaced); a
  full-width [TN, C*G] iota mask chain (~2x the matmul cost on the
  VPU — the [G, TN] mask touches 1/C of the elements).

Backward consumes dout in the forward's own [B, N, C] layout (no XLA
relayout), turns each [TN, C] tile C-major with the transpose unit,
spreads channels over their lane groups against the same [G, TN]
column one-hot (a free sublane broadcast + merge), and accumulates ONE
matmul dfmap[(c,g), u] = dexp @ rowhot_t^T over voxel tiles — the
scatter-add disappears.

Every one-hot sum has exactly one nonzero term, so the forward matches
`jnp.take_along_axis` bit-for-bit (bf16 values pass through f32
accumulators and bf16 MXU operands losslessly).

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

TILE_N = 2048


def _fwd_kernel(widx_ref, kidx_ref, fmap_ref, out_ref, *, g, c):
  # widx: lane-select index within a G-group; kidx: contraction (K)
  # index. Plain row layout: (px, py); column-blocked (CB > 1):
  # (px % Wb, py*CB + px//Wb) — see _gather_local.
  tn = widx_ref.shape[1]
  dt = fmap_ref.dtype
  i = pl.program_id(0)
  v = widx_ref[pl.ds(i, 1), :]  # (1, TN) i32
  u = kidx_ref[pl.ds(i, 1), :]  # (1, TN) i32
  h2p = fmap_ref.shape[2]
  rowhot_t = (jax.lax.broadcasted_iota(jnp.int32, (h2p, tn), 0) == u)
  # bf16 MXU matmuls accumulate in f32 natively; HIGHEST is only legal
  # (and only needed) for genuine f32 operands.
  prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
  rows_t = jax.lax.dot_general(
      fmap_ref[0], rowhot_t.astype(dt), (((1,), (0,)), ((), ())),
      precision=prec,
      preferred_element_type=jnp.float32)  # (C*G, TN) f32
  # Column select: one fused multiply-reduce over the sublane-split
  # [C, G, TN] view (free: G % 8 == 0). A full-width [.., C*G] iota
  # mask chain here measured ~2x the matmul cost; the [G, TN] mask +
  # broadcast over C touches 1/C of the elements.
  colmask = (jax.lax.broadcasted_iota(jnp.int32, (g, tn), 0) == v
             ).astype(jnp.float32).reshape(1, g, tn)
  picked = jnp.sum(rows_t.reshape(c, g, tn) * colmask, axis=1)  # (C, TN)
  out_ref[0] = jnp.transpose(picked, (1, 0)).astype(out_ref.dtype)


def _bwd_kernel(widx_ref, kidx_ref, dout_ref, dfmap_ref, *, g, c):
  h2p = dfmap_ref.shape[2]
  tn = widx_ref.shape[1]
  dt = dout_ref.dtype
  i = pl.program_id(0)
  v = widx_ref[pl.ds(i, 1), :]  # (1, TN) i32
  u = kidx_ref[pl.ds(i, 1), :]  # (1, TN) i32
  prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
  # dout arrives voxel-major (TN, C) — the forward's output layout, so
  # XLA inserts no relayout; the small per-tile block is turned C-major
  # by the transpose unit. Spreading each channel over its lane group
  # is a sublane broadcast + merge (free: G % 8 == 0), the column
  # one-hot a lane mask — exactly one nonzero per (c, g, n), so the
  # backward stays exact.
  dout_t = jnp.transpose(dout_ref[0], (1, 0))  # (C, TN)
  colmask = (jax.lax.broadcasted_iota(jnp.int32, (g, tn), 0) == v
             ).astype(dt).reshape(1, g, tn)
  d = (dout_t.reshape(c, 1, tn) * colmask).reshape(c * g, tn)
  rowhot_t = (jax.lax.broadcasted_iota(jnp.int32, (h2p, tn), 0) == u)
  contrib = jax.lax.dot_general(
      d, rowhot_t.astype(dt), (((1,), (1,)), ((), ())),
      precision=prec,
      preferred_element_type=jnp.float32)  # (C*G, H2p)

  @pl.when(pl.program_id(1) == 0)
  def _():
    dfmap_ref[0] = contrib

  @pl.when(pl.program_id(1) > 0)
  def _():
    dfmap_ref[0] += contrib


@functools.lru_cache(maxsize=None)
def _make(b, n, g, h2p, c, dt_name, interpret):
  dt = jnp.dtype(dt_name)
  nb = n // TILE_N
  fwd_call = pl.pallas_call(
      functools.partial(_fwd_kernel, g=g, c=c),
      grid=(b, nb),
      in_specs=[
          pl.BlockSpec((b, TILE_N), lambda i, j: (0, j)),
          pl.BlockSpec((b, TILE_N), lambda i, j: (0, j)),
          pl.BlockSpec((1, c * g, h2p), lambda i, j: (i, 0, 0)),
      ],
      out_specs=pl.BlockSpec((1, TILE_N, c), lambda i, j: (i, j, 0)),
      out_shape=jax.ShapeDtypeStruct((b, n, c), dt),
      interpret=interpret)
  bwd_call = pl.pallas_call(
      functools.partial(_bwd_kernel, g=g, c=c),
      grid=(b, nb),
      in_specs=[
          pl.BlockSpec((b, TILE_N), lambda i, j: (0, j)),
          pl.BlockSpec((b, TILE_N), lambda i, j: (0, j)),
          pl.BlockSpec((1, TILE_N, c), lambda i, j: (i, j, 0)),
      ],
      out_specs=pl.BlockSpec((1, c * g, h2p), lambda i, j: (i, 0, 0)),
      out_shape=jax.ShapeDtypeStruct((b, c * g, h2p), jnp.float32),
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
  """The single-shard gather (see `skip_gather`); batch = local batch.

  Column blocking: the contraction dim K pads to 128 lanes, so a small
  feature map (H2 < 128 rows) wastes most of the matmul — pack
  CB = 128 // H2 column-blocks of the image into K instead. The kernel
  is unchanged (it contracts a one-hot over K and lane-selects within a
  G-wide group); the prep just keys K by (row, column-block) and G by
  the within-block offset:

    fmapx[b, c*G + (x % Wb), y*CB + x // Wb] = fmap[b, y, x, c]
    kidx = py*CB + px // Wb      (the one-hot contraction index)
    widx = px % Wb               (the lane-select index)

  with Wb = ceil(W2 / CB), G = 8-padded Wb. CB = 1 reduces to the plain
  row layout (kidx = py, widx = px). For the production skip_4 map
  (34² pad, C = 24) this cuts the per-voxel MXU work 2.5x
  (C·G·K: 24·40·128 → 24·16·128); skip_5 (66²) has CB = 1 — packing two
  66-row blocks would push K past 128 into a 256-lane pad, a net loss.
  The gradient of the prep (pad/reshape/transpose) is XLA's, so the
  kernel's dfmap lands back in [B, H2, W2, C] automatically."""
  b, h2, w2, c = fmap_padded.shape
  n = px.shape[1]
  px = px.astype(jnp.int32)
  py = py.astype(jnp.int32)
  cb = max(1, 128 // h2)
  wb = -(-w2 // cb)
  g = ((wb + 7) // 8) * 8
  h2p = ((h2 * cb + 127) // 128) * 128
  if cb > 1:
    fmapx = jnp.pad(fmap_padded,
                    ((0, 0), (0, 0), (0, cb * wb - w2), (0, 0)))
    fmapx = fmapx.reshape(b, h2, cb, wb, c)
    fmapx = jnp.transpose(fmapx, (0, 4, 3, 1, 2))  # [b, c, wb, h2, cb]
    fmapx = jnp.pad(fmapx,
                    ((0, 0), (0, 0), (0, g - wb), (0, 0), (0, 0)))
    fmapx = fmapx.reshape(b, c * g, h2 * cb)
    fmapx = jnp.pad(fmapx, ((0, 0), (0, 0), (0, h2p - h2 * cb)))
    kidx = py * cb + px // wb
    widx = px % wb
  else:
    fmapx = jnp.transpose(fmap_padded, (0, 3, 2, 1))
    fmapx = jnp.pad(fmapx, ((0, 0), (0, 0), (0, g - w2), (0, h2p - h2)))
    fmapx = fmapx.reshape(b, c * g, h2p)
    kidx = py
    widx = px
  pad_n = (-n) % TILE_N
  if pad_n:
    widx = jnp.pad(widx, ((0, 0), (0, pad_n)))
    kidx = jnp.pad(kidx, ((0, 0), (0, pad_n)))
  gather = _make(b, n + pad_n, g, h2p, c, fmap_padded.dtype.name,
                 interpret)
  out = gather(fmapx, widx, kidx)
  if pad_n:
    out = out[:, :n, :]
  return out


def skip_gather(fmap_padded: jnp.ndarray,   # [B, H2, W2, C] float
                px: jnp.ndarray,            # [B, N] int32, in [0, W2)
                py: jnp.ndarray,            # [B, N] int32, in [0, H2)
                interpret: bool | None = None) -> jnp.ndarray:
  """Gathers fmap_padded[b, py, px, :] for each index pair.

  Returns [B, N, C] in fmap_padded's dtype; differentiable wrt
  fmap_padded (indices get no gradient). On a multi-device mesh the
  kernel (and its matmul backward) runs per shard under shard_map
  (parallel/kernel_sharding.py): batch over 'data', and — because the
  kernel grids over flat voxel blocks — N over a non-trivial 'space'
  axis too, with the feature map space-replicated (its cotangent is
  psum'd over 'space' by shard_map's transpose).
  """
  b = fmap_padded.shape[0]
  if interpret is None:
    interpret = jax.default_backend() != "tpu"
  core = functools.partial(_gather_local, interpret=bool(interpret))
  kernel_sharding.trace_counters["skip_gather"] += 1
  mode = kernel_sharding.kernel_mode(b, n=px.shape[1], allow_space=True)
  if isinstance(mode, Mesh):
    from jax.sharding import PartitionSpec as P
    if mode.shape.get("space", 1) > 1:
      return kernel_sharding.map_with_specs(
          core, mode,
          in_specs=(P("data"), P("data", "space"), P("data", "space")),
          out_specs=P("data", "space"))(fmap_padded, px, py)
    return kernel_sharding.map_over_data(core, mode, n_in=3)(
        fmap_padded, px, py)
  return core(fmap_padded, px, py)
