"""Space-to-depth (×2 per axis) execution of the 3D decoder's convolutions.

The decoder's hot layers have 16–32 channels at 64³–128³ resolution. On
TPU, a conv's output-channel count maps to the MXU's 128 output lanes, so
C_out = 16 uses 12.5% of the systolic array. Packing 2×2×2 voxel blocks
into channels multiplies the effective channel count by 8 (full lanes) at
the cost of moderately larger-but-denser kernels — a large net win for
this architecture.

Math (per axis, packing factor 2). Fine index m = 2M + r with packed cell
M and phase r ∈ {0, 1}; packed channel layout is phase-major:
packed[..., ((pz·2+py)·2+px)·C + c] = fine[2Z+pz, 2Y+py, 2X+px, c].

* conv (stride 1, pad p, kernel k):
    y[m] = Σ_dx x[m+dx−p]·W[dx]
    y[2M+r] = Σ_{dJ,a} x_packed[M+dJ, a]·W[2dJ + a − r + p]
  → packed conv with per-axis taps dJ and a (kernel-size-3 taps for k=5).

* transposed conv (stride 2, pad p, output_padding 1, kernel k), packed
  input AND packed output: fine output n = 2q + c, with q = 2J_out + rm:
    y[2q+c] = Σ_dj x[q+dj]·W[p + c − 2dj],   dj = 2dJ + a − rm
  → a packed-space transposed conv with stride 2, lowered like
    layers._phased_fused: one dense conv emitting (rm, c) × C_out· — i.e.
    4 per-axis phases — followed by a packed-space depth-to-space.

All functions take the ORIGINAL (unpacked) kernels; the packed kernels are
static gathers of them, so parameters and checkpoints are identical to the
unpacked decoder and gradients flow to the same tree.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
  """fine [B, D, H, W, C] → packed [B, D/2, H/2, W/2, 8C] (phase-major)."""
  b, d, h, w, c = x.shape
  assert d % 2 == 0 and h % 2 == 0 and w % 2 == 0
  x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
  x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))
  return x.reshape(b, d // 2, h // 2, w // 2, 8 * c)


def depth_to_space(x: jnp.ndarray, c: int) -> jnp.ndarray:
  """packed [B, D2, H2, W2, 8C] → fine [B, 2D2, 2H2, 2W2, C]."""
  b, d2, h2, w2, pc = x.shape
  assert pc == 8 * c
  x = x.reshape(b, d2, h2, w2, 2, 2, 2, c)
  x = jnp.transpose(x, (0, 1, 4, 2, 5, 3, 6, 7))
  return x.reshape(b, 2 * d2, 2 * h2, 2 * w2, c)


def _dn(x_shape, k_shape):
  return jax.lax.conv_dimension_numbers(
      x_shape, k_shape, ("NDHWC", "DHWIO", "NDHWC"))


def _axis_plan_conv(k: int, p: int):
  """Per-axis (dJ_lo, dJ_hi, index map) for the packed stride-1 conv.

  For output phase r and tap (dJ, a): fine kernel index
  w = 2dJ + a − r + p must lie in [0, k)."""
  # w ∈ [0, k) ⇒ dJ ∈ [ceil((r−a−p)/2), floor((k−1−a+r−p)/2)].
  los, his = [], []
  for r in (0, 1):
    for a in (0, 1):
      los.append(-(-(r - a - p) // 2))
      his.append((k - 1 - a + r - p) // 2)
  return min(los), max(his)


def take_static(x: jnp.ndarray, idx, axis: int) -> jnp.ndarray:
  """jnp.take with STATIC indices, lowered as unrolled slices + concat.

  XLA:TPU lowers a real gather on these kernel-expansion tensors as a
  while loop with dynamic-update-slice (~2 ms per expansion, re-run
  every training step because the weights change); static slices are
  pure data formatting."""
  parts = [jax.lax.slice_in_dim(x, int(i), int(i) + 1, axis=axis)
           for i in np.asarray(idx).reshape(-1)]
  return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=axis)


def _onehot_matmul(kernel: jnp.ndarray, flatw: np.ndarray,
                   valid: np.ndarray) -> jnp.ndarray:
  """Joint kernel expansion as ONE static 0/1 matmul.

  The packed kernels are static gathers of the fine kernel. Emitting
  them as per-axis slice/mask/transpose chains re-runs ~17 ms/step of
  XLA data formatting (the weights change every step); as a matmul
  against a precomputed one-hot matrix the whole expansion is ~1 G MACs
  on the MXU plus one regular middle-axis transpose, and its VJP is the
  transposed matmul (exact: one nonzero per row).

  Args:
    kernel: fine [k, k, k, cin, cout].
    flatw: [rows] int — flattened (w0*k + w1)*k + w2 fine index per
      packed row (clipped in-range; masked by `valid`).
    valid: [rows] bool — False rows become zeros.
  Returns: [rows, cin, cout].
  """
  k = kernel.shape[0]
  cin, cout = kernel.shape[3], kernel.shape[4]
  m = np.zeros((flatw.size, k ** 3), dtype=np.float32)
  m[np.arange(flatw.size), flatw] = valid
  prec = (jax.lax.Precision.HIGHEST if kernel.dtype == jnp.float32
          else None)
  packed = jnp.dot(jnp.asarray(m, kernel.dtype),
                   kernel.reshape(k ** 3, cin * cout), precision=prec)
  return packed.reshape(flatw.size, cin, cout)


@functools.lru_cache(maxsize=None)
def _conv_rows(k: int, p: int, dj_lo: int, taps: int):
  """Row index/validity for packed_conv, rows ordered
  (t0,t1,t2, a0,a1,a2, r0,r1,r2) so phase blocks land contiguously."""
  t = np.arange(taps)
  ph = np.arange(2)
  t0, t1, t2, a0, a1, a2, r0, r1, r2 = np.meshgrid(
      t, t, t, ph, ph, ph, ph, ph, ph, indexing="ij")

  def w(tt, aa, rr):
    return 2 * (dj_lo + tt) + aa - rr + p

  w0, w1, w2 = w(t0, a0, r0), w(t1, a1, r1), w(t2, a2, r2)
  valid = ((w0 >= 0) & (w0 < k) & (w1 >= 0) & (w1 < k)
           & (w2 >= 0) & (w2 < k))
  flatw = ((np.clip(w0, 0, k - 1) * k + np.clip(w1, 0, k - 1)) * k
           + np.clip(w2, 0, k - 1))
  return flatw.reshape(-1), valid.reshape(-1)


@functools.lru_cache(maxsize=None)
def _conv_transpose_rows(k: int, p: int, dj_lo: int, taps: int):
  """Row index/validity for packed_conv_transpose, rows ordered
  (t0,t1,t2, a0,a1,a2, rm0,rm1,rm2, c0,c1,c2)."""
  t = np.arange(taps)
  ph = np.arange(2)
  (t0, t1, t2, a0, a1, a2, rm0, rm1, rm2,
   c0, c1, c2) = np.meshgrid(t, t, t, ph, ph, ph, ph, ph, ph,
                             ph, ph, ph, indexing="ij")

  def w(tt, aa, rr, cc):
    return p + cc - 4 * (dj_lo + tt) - 2 * aa + 2 * rr

  w0, w1, w2 = w(t0, a0, rm0, c0), w(t1, a1, rm1, c1), w(t2, a2, rm2, c2)
  valid = ((w0 >= 0) & (w0 < k) & (w1 >= 0) & (w1 < k)
           & (w2 >= 0) & (w2 < k))
  flatw = ((np.clip(w0, 0, k - 1) * k + np.clip(w1, 0, k - 1)) * k
           + np.clip(w2, 0, k - 1))
  return flatw.reshape(-1), valid.reshape(-1)


def packed_conv(x_packed: jnp.ndarray, kernel: jnp.ndarray,
                padding: int,
                input_groups: tuple[int, ...] | None = None) -> jnp.ndarray:
  """Stride-1 'SAME-ish' conv on packed activations.

  Args:
    x_packed: [B, D2, H2, W2, 8·Cin].
    kernel: the ORIGINAL fine kernel [k, k, k, Cin, Cout] (odd k,
      padding = k // 2 so fine output size == fine input size).
    input_groups: fine-channel counts (g0, g1, …) summing to Cin when
      x_packed's channel axis is a BLOCK layout [8·g0 | 8·g1 | …] (each
      block phase-major) instead of one phase-major interleave. This is
      how skip concats stay a free lane concat: the activation keeps the
      two phase-major blocks side by side and the (static, tiny) kernel
      expansion reorders to match — no [.., 8, C] reshuffle of the big
      tensor, whose layout XLA otherwise propagates into every adjacent
      elementwise op.
  Returns: [B, D2, H2, W2, 8·Cout] (phase-major, ungrouped).
  """
  k = kernel.shape[0]
  p = padding
  assert kernel.shape[:3] == (k, k, k) and p == k // 2
  cin, cout = kernel.shape[3], kernel.shape[4]

  dj_lo, dj_hi = _axis_plan_conv(k, p)
  taps = dj_hi - dj_lo + 1

  # One-hot matmul expansion (see _onehot_matmul); rows ordered
  # (t0,t1,t2, a0,a1,a2, r0,r1,r2) so only ONE middle-axis transpose
  # interleaves ci into the input-phase block.
  flatw, valid = _conv_rows(k, p, dj_lo, taps)
  kk = _onehot_matmul(kernel, flatw, valid)
  kk = kk.reshape(taps, taps, taps, 8, 8, cin, cout)
  kk = jnp.transpose(kk, (0, 1, 2, 3, 5, 4, 6))
  if input_groups is not None:
    assert sum(input_groups) == cin, (input_groups, cin)
    parts, off = [], 0
    for g in input_groups:
      parts.append(kk[:, :, :, :, off:off + g].reshape(
          taps, taps, taps, 8 * g, 8 * cout))
      off += g
    kk = jnp.concatenate(parts, axis=3)
  else:
    kk = kk.reshape(taps, taps, taps, 8 * cin, 8 * cout)

  out = jax.lax.conv_general_dilated(
      x_packed, kk, window_strides=(1, 1, 1),
      padding=[(-dj_lo, dj_hi)] * 3, dimension_numbers=_dn(
          x_packed.shape, kk.shape))
  return out


def packed_conv_transpose(x_packed: jnp.ndarray, kernel: jnp.ndarray,
                          stride: int, padding: int,
                          output_padding: int,
                          phase_output: bool = False) -> jnp.ndarray:
  """Stride-2 transposed conv, packed input → packed output (fine size
  doubles; packed size doubles too).

  kernel: ORIGINAL fine kernel [k, k, k, Cin, Cout].

  With phase_output the final rm-into-space interleave is skipped and
  the conv's raw output [B, J0, J1, J2, 64*Cout] is returned, channel
  order (rm0, rm1, rm2, pz, py, px, c) — a deep-phase layout for
  voxel-order-invariant consumers (the training loss); profiled ~3 ms
  per step at the 128³ final stage.
  """
  assert stride == 2
  k = kernel.shape[0]
  p, op = padding, output_padding
  cin, cout = kernel.shape[3], kernel.shape[4]

  # Fine taps per output phase c: w = p + c − 2dj ∈ [0, k).
  # Packed taps: dj = 2dJ + a − rm → w = p + c − 2(2dJ + a − rm).
  los, his = [], []
  for c in (0, 1):
    for a in (0, 1):
      for rm in (0, 1):
        # dJ bounds from 0 ≤ p + c − 4dJ − 2a + 2rm ≤ k−1
        los.append(-(-(p + c - 2 * a + 2 * rm - (k - 1)) // 4))
        his.append((p + c - 2 * a + 2 * rm) // 4)
  dj_lo, dj_hi = min(los), max(his)
  taps = dj_hi - dj_lo + 1

  # One-hot matmul expansion (see _onehot_matmul); rows ordered
  # (t0,t1,t2, a0,a1,a2, rm0,rm1,rm2, c0,c1,c2) → the output-phase
  # block is (rm, c) with co minor, and one middle-axis transpose
  # interleaves ci into the input-phase block.
  flatw, valid = _conv_transpose_rows(k, p, dj_lo, taps)
  kk = _onehot_matmul(kernel, flatw, valid)
  kk = kk.reshape(taps, taps, taps, 8, 64, cin, cout)
  kk = jnp.transpose(kk, (0, 1, 2, 3, 5, 4, 6))
  kk = kk.reshape(taps, taps, taps, 8 * cin, 8 * 8 * cout)

  b = x_packed.shape[0]
  in_sp = x_packed.shape[1:4]
  # Packed output cells per axis: fine out = 2·fine_in (op makes it so),
  # packed out = fine_in = 2 · in_sp.
  q_count = [2 * s for s in in_sp]
  fine_out = [(2 * s - 1) * stride - 2 * p + k + op for s in in_sp]
  assert all(f == 2 * q for f, q in zip(fine_out, q_count)), (
      "packed conv-transpose requires fine output = 2 × packed input cells")

  # Packed-space transposed conv with stride 2 via one conv + d2s: output
  # positions J_out = 2·J + rm ⇒ conv over J with (q_count/2) positions.
  pads = [(-dj_lo, (q // 2 - 1 + dj_hi) - (s - 1))
          for q, s in zip(q_count, in_sp)]
  y = jax.lax.conv_general_dilated(
      x_packed, kk, window_strides=(1, 1, 1), padding=pads,
      dimension_numbers=_dn(x_packed.shape, kk.shape))
  if phase_output:
    return y
  # y: [B, J0, J1, J2, (rm0 rm1 rm2 · 8c·cout)] → interleave rm into space.
  j0, j1, j2 = y.shape[1:4]
  y = y.reshape(b, j0, j1, j2, 2, 2, 2, 8 * cout)
  y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7))
  return y.reshape(b, 2 * j0, 2 * j1, 2 * j2, 8 * cout)


# Note on packed concats: there is deliberately NO packed_concat helper.
# Concatenating a skip onto packed activations is a plain lane concat —
# the result is a BLOCK layout [8·ca | 8·cb] that the next conv consumes
# via `input_groups` (and BatchRenorm via `phase_groups`). A per-phase
# interleave here would reshape the big activation to [.., 8, C], and XLA
# propagates that mostly-empty minor-dims layout into every adjacent
# elementwise op (profiled ~12 ms/step of relu/bias/renorm overhead).
