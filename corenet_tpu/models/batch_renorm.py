"""Batch renormalization (Ioffe 2017) as a flax module.

Faithful to the reference's custom BatchRenorm
(/root/reference/src/corenet/model/batch_renorm.py:18-62): r/d correction
factors ramped by a step counter (r_max → 3 over steps 5k..40k, d_max → 5
over 5k..25k), running-stat momentum 0.01, biased batch variance in the
normalizer, and the reference's quirk of "unbiasing" the stored running
variance with channels/(channels-1) (batch_renorm.py:54) — reproduced for
training-dynamics parity.

TPU-native differences: channel-last layout, and batch statistics are
computed over the *global* (sharded) batch — under pjit the mean/var
reductions become cross-replica collectives automatically, which is
strictly better than the reference's per-GPU statistics under DDP.

State: 'params' {scale, bias}; 'batch_stats' {mean, var, steps}.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class BatchRenorm(nn.Module):
  eps: float = 1e-5
  momentum: float = 0.01
  # When activations are space-to-depth packed (models/packing.py), the
  # channel axis is [phase, fine-channel]; statistics/parameters stay
  # per fine channel, so results are identical to the unpacked layout.
  phase_packing: int = 1

  @nn.compact
  def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
    in_dtype = x.dtype
    in_shape = x.shape
    if self.phase_packing > 1:
      assert x.shape[-1] % self.phase_packing == 0
      x = x.reshape(x.shape[:-1] +
                    (self.phase_packing, x.shape[-1] // self.phase_packing))
    # Statistics (means/vars/running state) are float32 regardless of the
    # activation dtype — but the elementwise normalization stays in the
    # input dtype, so bf16 activations never materialize f32 copies
    # (these are the largest tensors in the decoder).
    num_channels = x.shape[-1]
    scale = self.param("scale", nn.initializers.ones, (num_channels,))
    bias = self.param("bias", nn.initializers.zeros, (num_channels,))
    ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros,
                            None, (num_channels,), jnp.float32)
    ra_var = self.variable("batch_stats", "var", nn.initializers.ones,
                           None, (num_channels,), jnp.float32)
    steps = self.variable("batch_stats", "steps",
                          lambda *_: jnp.zeros((), jnp.int32))

    running_std = jnp.sqrt(ra_var.value + self.eps)

    if train:
      nt = steps.value.astype(jnp.float32)
      d_max = jnp.clip(5.0 * (nt - 5000.0) / (25000.0 - 5000.0), 0.0, 5.0)
      r_max = 1.0 + jnp.clip(2.0 * (nt - 5000.0) / (40000.0 - 5000.0),
                             0.0, 2.0)

      reduce_axes = tuple(range(x.ndim - 1))
      if x.dtype == jnp.bfloat16:
        # One-pass statistics: E[x²] − mean² — both reduces share one
        # streaming read of x (XLA multi-output fusion) instead of the
        # two-pass mean-then-centered-variance form, which re-reads the
        # largest decoder tensors. Exact enough for bf16 activations
        # (values exactly representable in the f32 accumulator; the
        # cancellation error is far below bf16 resolution). The f32
        # path keeps the two-pass form for reference bit-parity. The
        # gradient is algebraically identical (d/dx = 2(x−mean)/N).
        xf = x.astype(jnp.float32)
        b_mean = jnp.mean(xf, axis=reduce_axes)
        b_var = jnp.maximum(
            jnp.mean(jnp.square(xf), axis=reduce_axes)
            - jnp.square(b_mean), 0.0)
      else:
        b_mean = jnp.mean(x, axis=reduce_axes, dtype=jnp.float32)
        b_var = jnp.mean(
            jnp.square((x - b_mean.astype(x.dtype)).astype(jnp.float32)),
            axis=reduce_axes, dtype=jnp.float32)
      b_std = jnp.sqrt(b_var + self.eps)

      sg = jax.lax.stop_gradient
      r = jnp.clip(sg(b_std) / running_std, 1.0 / r_max, r_max)
      d = jnp.clip((sg(b_mean) - ra_mean.value) / running_std, -d_max, d_max)
      scale_eff = (r / b_std).astype(x.dtype)
      shift_eff = (d - b_mean * r / b_std).astype(x.dtype)
      y = x * scale_eff + shift_eff

      if not self.is_initializing():
        # Reference quirk: "unbias" with channels/(channels-1).
        unbiased_var = sg(b_var) * num_channels / (num_channels - 1)
        ra_var.value = ra_var.value + self.momentum * (
            unbiased_var - ra_var.value)
        ra_mean.value = ra_mean.value + self.momentum * (
            sg(b_mean) - ra_mean.value)
        steps.value = steps.value + 1
    else:
      inv = 1.0 / running_std
      y = (x * inv.astype(x.dtype) +
           (-ra_mean.value * inv).astype(x.dtype))

    out = (y * scale.astype(y.dtype) + bias.astype(y.dtype)).astype(in_dtype)
    if self.phase_packing > 1:
      out = out.reshape(in_shape)
    return out
