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


# Step at which the r/d correction ramps engage (the reference's 5000,
# batch_renorm.py:24-27). Opt-in stabilization (VERDICT r3 #9):
# set_ramp_start(0) ties train-mode outputs to the running statistics
# from the first step, damping the running-stat displacement that a loss
# spike can otherwise cause while the ramps are still off. Process-global
# (every renorm layer shares it, like the reference's constants); read at
# trace time, so set it before building the train step. The default
# reproduces the reference's training dynamics bit-for-bit.
_RAMP_START = 5000


def set_ramp_start(steps: int) -> None:
  global _RAMP_START
  _RAMP_START = int(steps)


def ramp_start() -> int:
  return _RAMP_START


class BatchRenorm(nn.Module):
  eps: float = 1e-5
  momentum: float = 0.01
  # Per-instance override of the ramp start; None = the process default.
  ramp_start: int | None = None
  # When activations are space-to-depth packed (models/packing.py), the
  # channel axis is [phase, fine-channel]; statistics/parameters stay
  # per fine channel, so results are identical to the unpacked layout.
  phase_packing: int = 1
  # Block layout after a packed skip concat: channel axis is
  # [P·g0 | P·g1 | …] (each block phase-major over its own fine
  # channels, see packing.packed_conv input_groups). Fine channel order
  # is block order, matching the unpacked concat. Requires
  # phase_packing = P; parameters stay [sum(groups)].
  phase_groups: tuple[int, ...] | None = None

  @nn.compact
  def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
    in_dtype = x.dtype
    p = self.phase_packing
    assert x.shape[-1] % p == 0
    # Packed activations stay on the flat [..., P·C] view: statistics are
    # reduced at full 128-lane width to [P·C], folded to [C] on the tiny
    # vector, and per-channel vectors tiled back to [P·C] for the
    # elementwise passes. The former [..., P, C] reshape tiled the minor
    # dims as (P, C) — C ≤ 28 of 128 lanes — and dragged every adjacent
    # elementwise op (relu, bias add) into the same mostly-empty layout
    # via XLA layout propagation (~6 ms/step profiled).
    #
    # Statistics (means/vars/running state) are float32 regardless of the
    # activation dtype — but the elementwise normalization stays in the
    # input dtype, so bf16 activations never materialize f32 copies
    # (these are the largest tensors in the decoder).
    num_channels = x.shape[-1] // p
    groups = self.phase_groups
    if groups is not None:
      assert p > 1 and sum(groups) == num_channels, (groups, num_channels)

    def fold(v):
      """Per-packed-channel [P·C] f32 → per-fine-channel [C] (phase mean;
      phases have equal element counts, so this equals the joint mean).
      Under a block layout, folds each [P·g] block to [g] and keeps the
      blocks' fine-channel order."""
      if groups is not None:
        parts, off = [], 0
        for g in groups:
          parts.append(v[off:off + p * g].reshape(p, g).mean(axis=0))
          off += p * g
        return jnp.concatenate(parts)
      return v.reshape(p, num_channels).mean(axis=0) if p > 1 else v

    def tile(v, dtype):
      """Per-fine-channel [C] → per-packed-channel [P·C]."""
      if groups is not None:
        parts, off = [], 0
        for g in groups:
          parts.append(jnp.tile(v[off:off + g], p))
          off += g
        return jnp.concatenate(parts).astype(dtype)
      return (jnp.tile(v, p) if p > 1 else v).astype(dtype)
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
      s = float(self.ramp_start if self.ramp_start is not None
                else _RAMP_START)
      d_max = jnp.clip(5.0 * (nt - s) / 20000.0, 0.0, 5.0)
      r_max = 1.0 + jnp.clip(2.0 * (nt - s) / 35000.0, 0.0, 2.0)

      reduce_axes = tuple(range(x.ndim - 1))
      if x.dtype == jnp.bfloat16:
        # SHIFTED one-pass statistics: E[(x−c)²] − (E[x−c])² with
        # c = stop_gradient(running mean) — both reduces share one
        # streaming read of x (XLA multi-output fusion) instead of the
        # two-pass mean-then-centered-variance form, which re-reads the
        # largest decoder tensors. The shift by c (a constant w.r.t. the
        # reduce, one fused subtract per element) removes the
        # catastrophic cancellation the naive E[x²]−mean² form hits
        # when variance ≪ mean² (post-ReLU activations with large
        # means): around x−c ≈ 0 both terms are small, so the subtract
        # loses no significant bits. The f32 path keeps the two-pass
        # form for reference bit-parity. The gradient is algebraically
        # identical (d/dx = 2(x−mean)/N; c carries no gradient).
        c = jax.lax.stop_gradient(ra_mean.value)  # f32 [C]
        xf = x.astype(jnp.float32) - tile(c, jnp.float32)
        m_shift = fold(jnp.mean(xf, axis=reduce_axes))
        b_mean = m_shift + c
        b_var = jnp.maximum(
            fold(jnp.mean(jnp.square(xf), axis=reduce_axes))
            - jnp.square(m_shift), 0.0)
      else:
        b_mean = fold(jnp.mean(x, axis=reduce_axes, dtype=jnp.float32))
        b_var = fold(jnp.mean(
            jnp.square((x - tile(b_mean, x.dtype)).astype(jnp.float32)),
            axis=reduce_axes, dtype=jnp.float32))
      b_std = jnp.sqrt(b_var + self.eps)

      sg = jax.lax.stop_gradient
      r = jnp.clip(sg(b_std) / running_std, 1.0 / r_max, r_max)
      d = jnp.clip((sg(b_mean) - ra_mean.value) / running_std, -d_max, d_max)
      scale_eff = r / b_std
      shift_eff = d - b_mean * r / b_std
      y = x * tile(scale_eff, x.dtype) + tile(shift_eff, x.dtype)

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
      y = (x * tile(inv, x.dtype) + tile(-ra_mean.value * inv, x.dtype))

    out = (y * tile(scale, y.dtype) + tile(bias, y.dtype)).astype(in_dtype)
    return out
