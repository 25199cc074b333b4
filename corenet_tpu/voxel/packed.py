"""Bit-packed voxel grids: z-column occupancy as uint32 words + a packed
interior flood fill.

Layout: `packed` u32[..., H, W, NW] where bit b of word w at (y, x) is the
occupancy of voxel z = w*32 + b (NW = D // 32). This is 32x less data than
a float grid — the flood fill becomes pure integer VPU work on ~256KB per
128³ grid, and the z-direction sweep is intra-word bit arithmetic
(segmented Kogge-Stone) instead of a 128-element scan.

Semantics of `fill_inside_packed` match voxel/fill.fill_inside_voxels
(reference fill_voxels_cpu.cc:74-155 / fill_voxels_gpu.cu:136-171): empty
regions not 6-connected to the grid boundary are filled; output bit = 1
for occupied-or-inside.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_FULL = np.uint32(0xFFFFFFFF)


def pack_grid(grid: jnp.ndarray) -> jnp.ndarray:
  """numeric[..., D, H, W] (occupied iff > 0) → u32[..., H, W, D//32]."""
  d = grid.shape[-3]
  assert d % 32 == 0, f"depth {d} must be a multiple of 32"
  nw = d // 32
  occ = (grid > 0)
  # [..., D, H, W] → [..., H, W, D] → [..., H, W, NW, 32]
  occ = jnp.moveaxis(occ, -3, -1)
  occ = occ.reshape(occ.shape[:-1] + (nw, 32))
  weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
  return jnp.sum(jnp.where(occ, weights, jnp.uint32(0)), axis=-1,
                 dtype=jnp.uint32)


def unpack_grid(packed: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
  """u32[..., H, W, NW] → dtype[..., NW*32, H, W] of 0/1.

  Transposes the (tiny) packed words first and expands bits directly into
  the [D, H, W] layout — expanding first and transposing after would move
  the full-size grid through a minor-dimension transpose (measured ~15×
  slower at 128³)."""
  nw = packed.shape[-1]
  words = jnp.moveaxis(packed, -1, -3)  # [..., NW, H, W] — 32x smaller
  shifts = jnp.arange(32, dtype=jnp.uint32).reshape(32, 1, 1)
  bits = (words[..., None, :, :] >> shifts) & jnp.uint32(1)
  # [..., NW, 32, H, W] → [..., D, H, W]
  return bits.reshape(bits.shape[:-4] + (nw * 32,) + bits.shape[-2:]
                      ).astype(dtype)


def _trailing_ones(e: jnp.ndarray) -> jnp.ndarray:
  """Mask of the contiguous run of 1-bits starting at bit 0.

  ((e+1) & ~e) isolates the lowest zero bit; minus one gives the bits
  below it. Wraps correctly for e = all-ones (run = the whole word)."""
  return (((e + jnp.uint32(1)) & ~e) - jnp.uint32(1)).astype(jnp.uint32)


def _leading_ones(e: jnp.ndarray) -> jnp.ndarray:
  """Mask of the contiguous run of 1-bits ending at bit 31."""
  x = e
  x = x & ((x >> 1) | jnp.uint32(0x80000000))
  x = x & ((x >> 2) | jnp.uint32(0xC0000000))
  x = x & ((x >> 4) | jnp.uint32(0xF0000000))
  x = x & ((x >> 8) | jnp.uint32(0xFF000000))
  x = x & ((x >> 16) | jnp.uint32(0xFFFF0000))
  return x


def _kog_up(r: jnp.ndarray, e: jnp.ndarray) -> jnp.ndarray:
  """Segmented Kogge-Stone, LSB→MSB: bit i set iff ∃j≤i with r[j] and
  e[k] for all j≤k≤i. Assumes r ⊆ e."""
  f = e
  for k in (1, 2, 4, 8, 16):
    r = r | ((r << k) & f)
    f = f & (f << k)
  return r


def _kog_down(r: jnp.ndarray, e: jnp.ndarray) -> jnp.ndarray:
  """Segmented Kogge-Stone, MSB→LSB."""
  f = e
  for k in (1, 2, 4, 8, 16):
    r = r | ((r >> k) & f)
    f = f & (f >> k)
  return r


def _sweep_spatial(r: jnp.ndarray, e: jnp.ndarray, axis: int,
                   down: bool) -> jnp.ndarray:
  """Gated prefix-OR along a spatial (unpacked) axis via log-doubling.

  r, e: u32[..., H, W, NW]; bitwise ops act on all 32 z-lanes at once.
  """
  n = r.shape[axis]
  f = e
  shift = 1
  while shift < n:
    # shift by `shift` along axis: value from index i -+ shift
    def sh(x, s=shift):
      zero_shape = list(x.shape)
      zero_shape[axis] = s
      zeros = jnp.zeros(zero_shape, x.dtype)
      sl = [slice(None)] * x.ndim
      if down:
        sl[axis] = slice(0, x.shape[axis] - s)
        return jnp.concatenate([zeros, x[tuple(sl)]], axis=axis)
      sl[axis] = slice(s, None)
      return jnp.concatenate([x[tuple(sl)], zeros], axis=axis)
    r = r | (sh(r) & f)
    f = f & sh(f)
    shift *= 2
  return r


def _sweep_z(r: jnp.ndarray, e: jnp.ndarray, up: bool) -> jnp.ndarray:
  """Gated prefix-OR along z (the packed axis): intra-word Kogge-Stone +
  a short sequential carry chain across the NW words."""
  nw = r.shape[-1]
  if up:
    r = _kog_up(r, e)
    words_r = [r[..., w] for w in range(nw)]
    words_e = [e[..., w] for w in range(nw)]
    for w in range(1, nw):
      carry = words_r[w - 1] >> 31  # bit31 reached (already gated by e)
      spread = jnp.where(carry > 0, _trailing_ones(words_e[w]),
                         jnp.uint32(0))
      words_r[w] = _kog_up(words_r[w] | spread, words_e[w])
    return jnp.stack(words_r, axis=-1)
  r = _kog_down(r, e)
  words_r = [r[..., w] for w in range(nw)]
  words_e = [e[..., w] for w in range(nw)]
  for w in range(nw - 2, -1, -1):
    carry = words_r[w + 1] & jnp.uint32(1)
    spread = jnp.where(carry > 0, _leading_ones(words_e[w]), jnp.uint32(0))
    words_r[w] = _kog_down(words_r[w] | spread, words_e[w])
  return jnp.stack(words_r, axis=-1)


def fill_inside_packed(packed: jnp.ndarray,
                       fill_rounds: int | None = None) -> jnp.ndarray:
  """Interior fill on a packed grid.

  Args:
    packed: u32[..., H, W, NW] occupancy bits.
    fill_rounds: None = adaptive fixpoint (`while_loop`); int = exactly
      that many rounds as a static `fori_loop` (the multi-process-safe
      mode — see voxel/fill.py:_outside_mask; under shard_map the
      adaptive cond is shard-local and safe either way).

  Returns:
    u32[..., H, W, NW]: bit = 1 where occupied or enclosed-empty.
  """
  assert packed.ndim >= 3
  e = ~packed  # empty bits
  h, w, nw = packed.shape[-3], packed.shape[-2], packed.shape[-1]

  # Boundary seeds: z = 0 / z = D-1 bits, y/x boundary rows.
  seed = jnp.zeros_like(e)
  zmask = jnp.zeros((nw,), jnp.uint32).at[0].set(jnp.uint32(1))
  zmask = zmask.at[nw - 1].set(zmask[nw - 1] | jnp.uint32(0x80000000))
  seed = seed | (e & zmask)
  ymask = (jnp.arange(h) == 0) | (jnp.arange(h) == h - 1)
  seed = seed | jnp.where(ymask[:, None, None], e, jnp.uint32(0))
  xmask = (jnp.arange(w) == 0) | (jnp.arange(w) == w - 1)
  seed = seed | jnp.where(xmask[None, :, None], e, jnp.uint32(0))

  y_axis = packed.ndim - 3
  x_axis = packed.ndim - 2

  def round_fn(outside):
    outside = outside | _sweep_z(outside, e, up=True)
    outside = outside | _sweep_z(outside, e, up=False)
    for axis in (y_axis, x_axis):
      for down in (False, True):
        outside = outside | (e & _sweep_spatial(outside, e, axis, down))
    return outside

  if fill_rounds is not None:
    outside = jax.lax.fori_loop(0, fill_rounds,
                                lambda _, o: round_fn(o), seed)
    return ~outside

  def cond(state):
    return state[1]

  def body(state):
    outside, _ = state
    new = round_fn(outside)
    return new, jnp.any(new != outside)

  outside, _ = jax.lax.while_loop(cond, body, (seed, jnp.array(True)))
  return ~outside
