"""Pallas TPU kernel: bit-packed occupancy → phase-major GT.

The phase-loss training path (train/step.py) pairs a phased VIEW of the
decoder's logits with a phased copy of the GT grid. Producing that copy
in XLA means unpacking the bit-packed voxelizer output (voxel/packed.py)
to a full grid and running a 10-D split/transpose — profiled at
~9 ms/step at 128³ (the intermediate is a u32 tensor with (2, 128)
tiling). This kernel emits the phased layout straight from the packed
words in one pass.

Layouts (factor s per axis, s ∈ {2, 4}; fine index = s·J + c):
  in   u32[B, NW, H, W]   — bit b of word w at (y, x) = occupancy of
                            z = 32·w + b (voxel/packed.py, words moved
                            ahead of the spatial dims), with the rows
                            pre-permuted y → (yc, jy) by the caller (a
                            cheap XLA transpose of the 32×-smaller
                            packed array).
  out  f32[B, D/s, H/s, (W/s)·s³] of exact 0/1
       lane = jx·s³ + zpart[zc] + ypart[yc] + xpart[xc]
       with the phase digits split as c = 2·c1 + c2 (s = 4) and the
       channel order (z1, y1, x1, z2, y2, x2) — exactly the
       train/step.py GT permutation for the factor-8 and factor-64
       phase-loss layouts.

Design: the whole per-(batch, word-plane) shuffle is ONE MXU matmul.
Bit-planes are extracted with shifts, their (zc, yc) row bands
lane-concatenated into a "fat" activation [rows·H/s, s²·W], and
multiplied by a static block-row one-hot P_fat whose (zc, yc) block is
the x-spread matrix pre-shifted by that band's phase-lane offset — the
matmul performs the lane permutation, the band accumulation, AND the
phase shifts in a single [·, s²W] × [s²W, Ws²] contraction at full MXU
utilization. (Earlier variants used per-band dots plus lane rolls:
~64 small serial matmuls per program ran at <5% MXU and were no faster
than the XLA chain.)

Numerics are exact: 0/1 values in bf16 operands, f32 accumulation, one
contribution per output lane (the permutation is a bijection). Output is f32
(sub-32-bit stores from this kernel wedge the compiled Mosaic pipeline
on this backend — every later device op hangs; the loss consumers
compare gt == 1, exact either way). GT carries no gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.sharding import Mesh

from corenet_tpu.parallel import kernel_sharding


def _digit_parts(s: int):
  """Lane contribution of each in-cell coordinate, per axis.

  Channel order (z1, y1, x1, z2, y2, x2): for s=2 the (z1,y1,x1) weights
  are (4,2,1); for s=4 the digit c = 2c1+c2 has weights z:(32,4),
  y:(16,2), x:(8,1)."""
  if s == 2:
    return [4], [2], [1]
  assert s == 4
  return [32, 4], [16, 2], [8, 1]


def _parts(weights, s):
  out = []
  for c in range(s):
    digits = []
    v = c
    for _ in weights:
      digits.append(v & 1)
      v >>= 1
    digits.reverse()  # c = 2*c1 + c2 → digits (c1, c2)
    out.append(sum(w * d for w, d in zip(weights, digits)))
  return out


def _kernel(words_ref, pfat_ref, out_ref, *, s, h, w):
  rows = 32 // s           # output z rows per word-plane
  band = h // s            # jy extent
  words = words_ref[0, 0]  # u32[H, W], rows ordered (yc, jy)

  fat = []
  for jzl in range(rows):
    blocks = []
    for zc in range(s):
      # u32 → i32 → bf16 (compiled Mosaic has no direct u32→bf16 cast;
      # values are 0/1, the detour is exact).
      occ = ((words >> jnp.uint32(s * jzl + zc)) & jnp.uint32(1)
             ).astype(jnp.int32).astype(jnp.bfloat16)
      for yc in range(s):
        blocks.append(occ[yc * band:(yc + 1) * band, :])
    fat.append(jnp.concatenate(blocks, axis=1))  # [band, s²·W]
  occ_fat = jnp.concatenate(fat, axis=0)         # [rows·band, s²·W]

  r = jax.lax.dot(occ_fat, pfat_ref[:],
                  preferred_element_type=jnp.float32)
  out_ref[0] = r.reshape(rows, band, w * s * s)


@functools.lru_cache(maxsize=None)
def _pfat(s: int, w: int):
  """Block-row one-hot [s²·W, W·s²]: block (zc, yc) spreads source lane
  x to jx·s³ + xpart[xc] + zpart[zc] + ypart[yc].

  Returns NUMPY (not jnp): the first call can happen inside a jit trace,
  and caching the jnp conversion there would cache a constant tracer —
  a leak that poisons every later call outside that trace."""
  zw, yw, xw = _digit_parts(s)
  zpart, ypart, xpart = _parts(zw, s), _parts(yw, s), _parts(xw, s)
  p = np.zeros((s * s * w, w * s * s), np.float32)
  for zc in range(s):
    for yc in range(s):
      base = (zc * s + yc) * w
      off = zpart[zc] + ypart[yc]
      for x in range(w):
        p[base + x, (x // s) * s ** 3 + xpart[x % s] + off] = 1.0
  return p.astype(jnp.bfloat16)  # numpy with ml_dtypes bfloat16


@functools.lru_cache(maxsize=None)
def _make(b, nw, h, w, s, interpret):
  kernel = functools.partial(_kernel, s=s, h=h, w=w)
  rows = 32 // s
  return pl.pallas_call(
      kernel,
      grid=(b, nw),
      in_specs=[
          pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0)),
          pl.BlockSpec((s * s * w, w * s * s), lambda i, j: (0, 0)),
      ],
      out_specs=pl.BlockSpec((1, rows, h // s, (w // s) * s ** 3),
                             lambda i, j: (i, j, 0, 0)),
      out_shape=jax.ShapeDtypeStruct(
          (b, nw * rows, h // s, (w // s) * s ** 3), jnp.float32),
      interpret=interpret)


def phased_gt(packed: jnp.ndarray, s: int,
              interpret: bool | None = None) -> jnp.ndarray:
  """u32[B, H, W, NW] packed occupancy → f32[B, D/s, H/s, (W/s)·s³].

  Output values are exact 0/1 (the caller ORs mesh slots first — FG_BG
  GT). On a multi-device pure-data mesh the kernel runs per batch shard
  under shard_map (parallel/kernel_sharding.py); under a non-trivial
  'space' axis the batch shards over data x space (each device phases
  whole scenes — the kernel is batch-gridded, so per-shard semantics are
  exact) and the training step's sharding constraint reshards the result
  into P('data', 'space') with an ICI all-to-all, the same route the
  blocked rasterizer takes (voxel/raster_fast.py)."""
  assert s in (2, 4)
  b, h, w, nw = packed.shape
  assert h % s == 0 and w % s == 0 and 32 % s == 0
  if interpret is None:
    interpret = jax.default_backend() != "tpu"

  def call(pk):
    words = jnp.moveaxis(pk, -1, 1)  # [B, NW, H, W] — 32× smaller than
    # the unpacked grid; a cheap XLA transpose.
    # Row pre-permutation y → (yc, jy): reshape+transpose on the packed
    # words so the kernel's row bands are contiguous slices.
    words = words.reshape(pk.shape[0], nw, h // s, s, w)
    words = jnp.transpose(words, (0, 1, 3, 2, 4)).reshape(
        pk.shape[0], nw, h, w)
    fn = _make(pk.shape[0], nw, h, w, s, bool(interpret))
    return fn(words, _pfat(s, w))

  kernel_sharding.trace_counters["phased_gt"] += 1
  mode = kernel_sharding.kernel_mode(b, allow_space_batch=True)
  if isinstance(mode, Mesh):
    axes = (("data", "space") if mode.shape.get("space", 1) > 1
            else ("data",))
    return kernel_sharding.map_over_data(call, mode, n_in=1,
                                         axes=axes)(packed)
  return call(packed)
