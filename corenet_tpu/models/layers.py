"""Conv/linear primitives with exact torch-style shape semantics.

TPU-native layouts: NHWC for 2D, NDHWC for 3D, kernels (spatial..., I, O).
The wrappers expose torch-style (kernel, stride, padding, output_padding)
parameters so the reference architecture's shape algebra
(/root/reference/src/corenet/model/reconstruction_decoder.py:49-95) carries
over verbatim, while the lowering is idiomatic XLA
(`lax.conv_general_dilated`, which maps onto the MXU).

Initializers reproduce torch magnitudes: `kaiming_normal_(fan_in, relu)`
for the encoder convs (resnet50.py:39-46) and torch's default
kaiming-uniform(a=√5) ≡ U(±1/√fan_in) elsewhere, including torch's quirk
of counting a ConvTranspose's fan_in over the *output* channels.
"""

from __future__ import annotations

import math
from typing import Any, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

IntOrTuple = Union[int, Tuple[int, ...]]


def _tuple(v: IntOrTuple, n: int) -> Tuple[int, ...]:
  if isinstance(v, int):
    return (v,) * n
  v = tuple(int(x) for x in v)
  assert len(v) == n
  return v


def kaiming_normal_fan_in():
  """torch.nn.init.kaiming_normal_(mode='fan_in', nonlinearity='relu')."""
  return nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")


def torch_default_kernel_init(fan_in: int):
  """torch's default conv/linear kernel init: U(-1/√fan_in, 1/√fan_in)."""
  bound = 1.0 / math.sqrt(fan_in)

  def init(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -bound, bound)

  return init


def torch_bias_init(fan_in: int):
  return torch_default_kernel_init(fan_in)


class Conv(nn.Module):
  """N-d convolution with torch-style symmetric integer padding.

  kernel layout: spatial + (in, out). Input layout: batch + spatial + channel.
  """
  features: int
  kernel_size: IntOrTuple
  ndim: int
  stride: IntOrTuple = 1
  padding: IntOrTuple = 0
  use_bias: bool = True
  kernel_init_mode: str = "torch_default"  # or "kaiming_normal"
  compute_dtype: Any = None  # e.g. jnp.bfloat16; params stay float32
  # Space-to-depth execution (3D, stride 1, padding k//2 only): input and
  # output are ×2-packed [.., D/2, H/2, W/2, 8C]. Same parameters.
  packed_io: bool = False
  # Packed input in block layout [8·g0 | 8·g1 | …] after a skip concat
  # (see packing.packed_conv). Fine in_features = sum(input_groups).
  input_groups: tuple[int, ...] | None = None

  @nn.compact
  def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
    n = self.ndim
    k = _tuple(self.kernel_size, n)
    s = _tuple(self.stride, n)
    p = _tuple(self.padding, n)
    in_features = x.shape[-1]
    if self.packed_io:
      assert in_features % 8 == 0
      in_features //= 8  # fine channel count; params stay unpacked
    kernel_shape = k + (in_features, self.features)
    fan_in = in_features * math.prod(k)
    if self.kernel_init_mode == "kaiming_normal":
      kernel_init = kaiming_normal_fan_in()
    else:
      kernel_init = torch_default_kernel_init(fan_in)
    kernel = self.param("kernel", kernel_init, kernel_shape)

    if self.compute_dtype is not None:
      x = x.astype(self.compute_dtype)
      kernel = kernel.astype(self.compute_dtype)
    if self.packed_io:
      from corenet_tpu.models import packing
      assert n == 3 and all(si == 1 for si in s) and all(
          pi == ki // 2 for pi, ki in zip(p, k))
      y = packing.packed_conv(x, kernel, p[0],
                              input_groups=self.input_groups)
      if self.use_bias:
        bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
        y = (y + jnp.tile(bias, 8).astype(y.dtype)).astype(y.dtype)
      return y
    spatial = "".join("DHW"[3 - n:][i] for i in range(n))
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel_shape,
        (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"))
    # No preferred_element_type: TPU bf16 convs accumulate in f32
    # internally, and an f32 output here would break the conv transpose
    # rule's dtype agreement under autodiff.
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=s, padding=[(pi, pi) for pi in p],
        dimension_numbers=dn)
    if self.use_bias:
      bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
      y = (y + bias).astype(y.dtype)
    return y


class ConvTranspose(nn.Module):
  """N-d transposed convolution with exact torch ConvTransposeNd semantics.

  out = (in - 1) * stride - 2 * padding + kernel + output_padding.

  Two lowerings, bit-identical results:
  * "dilated": one input-dilated `conv_general_dilated` with a flipped
    kernel.
  * "phased" (default for stride > 1): sub-pixel phase decomposition —
    one dense VALID-ish convolution per output phase r ∈ ∏ stride, with
    the strided kernel slice that touches that phase, interleaved into the
    output. This performs only the useful multiplies (kernelⁿ/strideⁿ per
    output element), keeps every conv dense (MXU/eigen fast paths), and
    avoids XLA:CPU's pathological naive fallback for dilated convs.
  """
  features: int
  kernel_size: IntOrTuple
  ndim: int
  stride: IntOrTuple = 1
  padding: IntOrTuple = 0
  output_padding: IntOrTuple = 0
  use_bias: bool = True
  method: str = "auto"  # "auto" | "dilated" | "phased"
  compute_dtype: Any = None  # e.g. jnp.bfloat16; params stay float32
  # Space-to-depth execution (3D, stride 2 only): packed in AND out.
  packed_io: bool = False
  # With the phased_fused lowering: return the conv's raw phase-major
  # output [B, q..., prod(stride)*features] (channel = (r..., f)) and
  # skip the depth-to-space interleave — the same layout packing.py
  # uses, so consumers that are voxel-order invariant (the training
  # loss) avoid two full-size transposes at the final resolution.
  phase_output: bool = False

  @nn.compact
  def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
    n = self.ndim
    k = _tuple(self.kernel_size, n)
    s = _tuple(self.stride, n)
    p = _tuple(self.padding, n)
    op = _tuple(self.output_padding, n)
    in_features = x.shape[-1]
    if self.packed_io:
      assert in_features % 8 == 0
      in_features //= 8
    kernel_shape = k + (in_features, self.features)
    # torch counts a ConvTranspose's fan_in over output channels.
    fan_in = self.features * math.prod(k)
    kernel = self.param("kernel", torch_default_kernel_init(fan_in),
                        kernel_shape)
    if self.compute_dtype is not None:
      x = x.astype(self.compute_dtype)
      kernel = kernel.astype(self.compute_dtype)

    if self.packed_io:
      from corenet_tpu.models import packing
      assert n == 3 and all(si == 2 for si in s)
      assert len(set(k)) == 1 and len(set(p)) == 1 and len(set(op)) == 1
      y = packing.packed_conv_transpose(x, kernel, 2, p[0], op[0],
                                        phase_output=self.phase_output)
      if self.use_bias:
        bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
        reps = 64 if self.phase_output else 8
        y = (y + jnp.tile(bias, reps).astype(y.dtype)).astype(y.dtype)
      return y

    in_spatial = x.shape[1:-1]
    out_spatial = tuple(
        (i - 1) * si - 2 * pi + ki + opi
        for i, si, pi, ki, opi in zip(in_spatial, s, p, k, op))
    method = self.method
    if method == "auto":
      # Phase decomposition only pays off with real strides and real
      # spatial extent; in=1 (the decoder's latent seed) stays dilated.
      if not (any(si > 1 for si in s) and all(d > 1 for d in in_spatial)):
        method = "dilated"
      elif all(o % si == 0 for o, si in zip(out_spatial, s)):
        method = "phased_fused"
      else:
        method = "phased"

    if self.phase_output:
      assert method == "phased_fused", (
          "phase_output requires the phased_fused lowering "
          f"(got {method})")
      y = self._phased_fused(x, kernel, k, s, p, op, out_spatial,
                             phase_out=True)
      if self.use_bias:
        bias = self.param("bias", torch_bias_init(fan_in),
                          (self.features,))
        y = y + jnp.tile(bias, math.prod(s)).astype(y.dtype)
      return y

    if method == "dilated":
      y = self._dilated(x, kernel, k, s, p, op)
    elif method == "phased_fused":
      y = self._phased_fused(x, kernel, k, s, p, op, out_spatial)
    else:
      y = self._phased(x, kernel, k, s, p, op)

    if self.use_bias:
      bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
      y = y + bias.astype(y.dtype)
    return y

  def _dn(self, x_shape, kernel_shape):
    n = self.ndim
    spatial = "".join("DHW"[3 - n:][i] for i in range(n))
    return jax.lax.conv_dimension_numbers(
        x_shape, kernel_shape,
        (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"))

  def _dilated(self, x, kernel, k, s, p, op):
    n = self.ndim
    flipped = jnp.flip(kernel, axis=tuple(range(n)))
    pad = [(ki - 1 - pi, ki - 1 - pi + opi) for ki, pi, opi in zip(k, p, op)]
    return jax.lax.conv_general_dilated(
        x, flipped, window_strides=(1,) * n, padding=pad,
        lhs_dilation=s, dimension_numbers=self._dn(x.shape, kernel.shape))

  def _phased_fused(self, x, kernel, k, s, p, op, out_spatial,
                    phase_out=False):
    """All ∏s output phases in ONE dense convolution emitting
    features·∏s channels, followed by a depth-to-space interleave.

    For output n = s·q + r: y[n] = Σ_dj x[q+dj]·W[p + r − s·dj]. The
    combined kernel stacks every phase's (zero-padded) tap slice on the
    output-channel axis, so the conv's N dimension is features·∏s — full
    MXU lanes even for small feature counts — and the interleave is a
    reshape/transpose instead of ∏s strided scatters. Requires s | out
    (true for every decoder stage here).
    """
    import numpy as np
    n = self.ndim
    in_spatial = x.shape[1:-1]

    dj_lo, dj_hi = [], []
    for d in range(n):
      ki, si, pi = k[d], s[d], p[d]
      los, his = [], []
      for r in range(si):
        los.append(-((ki - 1 - pi - r) // si))  # ceil((p+r-k+1)/s)
        his.append((pi + r) // si)
      dj_lo.append(min(los))
      dj_hi.append(max(his))

    # Combined kernel: [taps..., in, s_0*...*s_{n-1} * features], with
    # entry for phase r, tap t (dj = dj_lo + t): W[p + r − s·dj] or zero.
    # Dims are processed in reverse so `axis=d` always addresses the
    # original kernel dim (each step splits dim d into (phase, tap)).
    taps = [hi - lo + 1 for lo, hi in zip(dj_lo, dj_hi)]
    in_features = x.shape[-1]
    num_phases = math.prod(s)
    kcomb = kernel  # [k0, ..., kn-1, I, O]
    for d in reversed(range(n)):
      ki, si, pi = k[d], s[d], p[d]
      t_idx = np.arange(taps[d])
      r_idx = np.arange(si)
      # widx[r, t] = p + r - s*(dj_lo + t)
      widx = pi + r_idx[:, None] - si * (dj_lo[d] + t_idx[None, :])
      valid = (widx >= 0) & (widx < ki)
      widx_c = np.clip(widx, 0, ki - 1)
      # take along dim d: result axis order [r, t] inserted at d.
      from corenet_tpu.models.packing import take_static
      kd = take_static(kcomb, widx_c.reshape(-1), d)
      new_shape = (kcomb.shape[:d] + (si, taps[d]) + kcomb.shape[d + 1:])
      kd = kd.reshape(new_shape)
      mask_shape = [1] * len(new_shape)
      mask_shape[d] = si
      mask_shape[d + 1] = taps[d]
      kd = kd * jnp.asarray(valid, kd.dtype).reshape(mask_shape)
      kcomb = kd  # now has a phase axis at d and tap axis at d+1

    # kcomb axes: [r0, t0, r1, t1, ..., I, O] → [t..., I, (r..., O)]
    perm = ([2 * d + 1 for d in range(n)] + [2 * n] +
            [2 * d for d in range(n)] + [2 * n + 1])
    kcomb = jnp.transpose(kcomb, perm)
    kcomb = kcomb.reshape(tuple(taps) + (in_features,
                                         num_phases * self.features))

    pads = []
    for d in range(n):
      q_count = out_spatial[d] // s[d]
      pads.append((-dj_lo[d], (q_count - 1 + dj_hi[d]) -
                   (in_spatial[d] - 1)))
    y = jax.lax.conv_general_dilated(
        x, kcomb, window_strides=(1,) * n, padding=pads,
        dimension_numbers=self._dn(x.shape, kcomb.shape))

    if phase_out:
      return y  # [B, q..., prod(s)*F], channel-major order (r..., f)

    # Depth-to-space: [B, q..., (r..., F)] → [B, (q*s)..., F].
    b = x.shape[0]
    qs = [o // si for o, si in zip(out_spatial, s)]
    y = y.reshape((b,) + tuple(qs) + tuple(s) + (self.features,))
    # interleave: axis order B, q0, r0, q1, r1, ..., F
    order = [0]
    for d in range(n):
      order += [1 + d, 1 + n + d]
    order += [1 + 2 * n]
    y = jnp.transpose(y, order)
    return y.reshape((b,) + tuple(out_spatial) + (self.features,))

  def _phased(self, x, kernel, k, s, p, op):
    """Sub-pixel decomposition. For output index n = s·q + r along a dim:
    y[n] = Σ_dj x[q+dj] · W[p + r − s·dj]  with p + r − s·dj ∈ [0, k).
    Per (dim, phase r): dj ∈ [ceil((p+r−k+1)/s), floor((p+r)/s)] and the
    kernel slice W[p+r−s·dj] is a static strided gather."""
    import numpy as np
    n = self.ndim
    in_spatial = x.shape[1:-1]
    out_spatial = tuple(
        (i - 1) * si - 2 * pi + ki + opi
        for i, si, pi, ki, opi in zip(in_spatial, s, p, k, op))

    # Per-dim, per-phase static slicing plans.
    def plan(dim):
      ki, si, pi = k[dim], s[dim], p[dim]
      out_i, in_i = out_spatial[dim], in_spatial[dim]
      plans = []
      for r in range(si):
        dj_min = -((ki - 1 - pi - r) // si)
        dj_max = (pi + r) // si
        w_idx = [pi + r - si * dj for dj in range(dj_min, dj_max + 1)]
        w_idx = [wi for wi in w_idx if 0 <= wi < ki]
        # Recompute dj bounds from surviving indices (robust to clipping).
        djs = [(pi + r - wi) // si for wi in w_idx]
        q_count = len(range(r, out_i, si))
        if not w_idx or q_count == 0:
          plans.append(None)
          continue
        dj_lo, dj_hi = min(djs), max(djs)
        # conv taps ascend in x index: t-th tap reads x[q + dj_lo + t];
        # kernel entry for dj = dj_lo + t is W[pi + r - si*(dj_lo+t)].
        w_idx_sorted = [pi + r - si * (dj_lo + t)
                        for t in range(dj_hi - dj_lo + 1)]
        pad_lo = -dj_lo
        pad_hi = (q_count - 1 + dj_hi) - (in_i - 1)
        plans.append((r, np.array(w_idx_sorted), (pad_lo, pad_hi), q_count))
      return plans

    dim_plans = [plan(d) for d in range(n)]
    out_shape = (x.shape[0],) + out_spatial + (self.features,)
    y = jnp.zeros(out_shape, x.dtype)

    import itertools
    for combo in itertools.product(*dim_plans):
      if any(c is None for c in combo):
        continue
      sub_kernel = kernel
      for d, (_, w_idx, _, _) in enumerate(combo):
        from corenet_tpu.models.packing import take_static
        sub_kernel = take_static(sub_kernel, w_idx, d)
      pads = [c[2] for c in combo]
      yr = jax.lax.conv_general_dilated(
          x, sub_kernel, window_strides=(1,) * n, padding=pads,
          dimension_numbers=self._dn(x.shape, sub_kernel.shape))
      index = (slice(None),) + tuple(
          slice(c[0], None, si) for c, si in zip(combo, s)) + (slice(None),)
      y = y.at[index].set(yr)
    return y


class Linear(nn.Module):
  """Dense layer with torch default init."""
  features: int
  compute_dtype: Any = None

  @nn.compact
  def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
    in_features = x.shape[-1]
    kernel = self.param("kernel", torch_default_kernel_init(in_features),
                        (in_features, self.features))
    bias = self.param("bias", torch_bias_init(in_features), (self.features,))
    if self.compute_dtype is not None:
      x = x.astype(self.compute_dtype)
      kernel = kernel.astype(self.compute_dtype)
      bias = bias.astype(self.compute_dtype)
    return x @ kernel + bias


def max_pool_2d(x: jnp.ndarray, kernel: int, stride: int,
                padding: int) -> jnp.ndarray:
  """Max pooling with torch-style symmetric zero... -inf padding (NHWC)."""
  return jax.lax.reduce_window(
      x, -jnp.inf, jax.lax.max,
      window_dimensions=(1, kernel, kernel, 1),
      window_strides=(1, stride, stride, 1),
      padding=((0, 0), (padding, padding), (padding, padding), (0, 0)))
