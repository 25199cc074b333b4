"""3D reconstruction decoder with ray-traced skip connections.

Structure mirrors the reference ReconstructionDecoder
(/root/reference/src/corenet/model/reconstruction_decoder.py:29-152):
latent 2048→L linear, concat (x, y, z) grid offsets, ConvTranspose3d to the
initial grid, five {ReLU, BN, Conv3d, ReLU, BN, ConvTranspose3d} towers
doubling resolution, with ray-traced skips concatenating
round(C·skip_fraction) channels sampled from ResNet stages 5/5/4/3/2 after
stages 1..5 (stage 1's skip is disabled, as in the reference), and a final
ConvTranspose3d with stride last_upscale_factor to the output channels.

The per-layer projection matrix reproduces the reference's
voxel_projection_matrix @ scale(full_res / layer_res) with the (D, H, W)
ratio vector applied to (x, y, z) coordinates (a quirk that is the identity
for the cubic grids used everywhere; reconstruction_decoder.py:108-116).

Layouts are channel-last (NDHWC); output logits are [B, D, H, W, C].
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from corenet_tpu.models import layers
from corenet_tpu.models.batch_renorm import BatchRenorm
from corenet_tpu.models.resnet50 import ResNet50Features
from corenet_tpu.models.skip import SampleGrid2d


def _bn(name=None, phase_packing=1, phase_groups=None):
  return BatchRenorm(eps=1e-3, name=name, phase_packing=phase_packing,
                     phase_groups=phase_groups)


class ReconstructionDecoder(nn.Module):
  resolution: Tuple[int, int, int]  # (depth, height, width)
  num_output_channels: int
  last_upscale_factor: int = 2
  latent_channels: int = 64
  skip_fraction: float = 0.75
  compute_dtype: Any = None
  # Space-to-depth execution (models/packing.py): activations run ×2
  # packed so every conv fills the MXU's output lanes. Bit-equivalent to
  # the unpacked path (same parameters); requires last_upscale_factor 2
  # and an even grid at the packing point. Large speedup on TPU.
  packed: bool = False
  # First tower executed packed (space-to-depth happens right before it;
  # earlier towers run fine). Early towers have ≥128 fine channels —
  # already full MXU lanes — and tiny spatial extents, so packing them
  # buys nothing and pays the packed-kernel expansion data movement
  # (the stage-2/3 expanded kernels are 200-270 MB each, ~10 ms/step
  # profiled); stage 5 onward (fine 32³→128³, C ≤ 32) keeps the win.
  # Measured on the production bench: pfs 2 (pack everything, the old
  # behavior) ≈ 80, pfs 3 ≈ 80, pfs 4 ≈ 96, pfs 5 ≈ 99 scenes/s.
  pack_from_stage: int = 5
  # With packed: return the final logits still phase-packed
  # ([B, D/2, H/2, W/2, 8*C], phase-major (pz,py,px,c), compute dtype)
  # instead of depth_to_space + float32. The training loss is
  # voxel-order invariant, so the consumer can pair this with a phased
  # view of the GT grid and skip the 128³ unpack/convert entirely
  # (profiled at ~15 ms/step).
  phase_output: bool = False

  def _skip_channels(self, c: int) -> int:
    return round(c * self.skip_fraction)

  @nn.compact
  def __call__(self, image_features: ResNet50Features,
               voxel_projection_matrix: jnp.ndarray,
               voxel_sample_locations: jnp.ndarray,
               train: bool) -> jnp.ndarray:
    depth, height, width = self.resolution
    div = 16 * self.last_upscale_factor
    assert depth % div == 0 and height % div == 0 and width % div == 0
    ir = (depth // div, height // div, width // div)
    packed = self.packed
    if packed:
      # 2 = pack everything; 6 = only the last tower. Out-of-range values
      # error rather than silently running a different configuration.
      assert 2 <= self.pack_from_stage <= 6, self.pack_from_stage
    pfs = self.pack_from_stage if packed else 99
    if packed:
      pack_sp = tuple(v * 2 ** (pfs - 2) for v in ir)
      assert self.last_upscale_factor == 2 and all(
          v % 2 == 0 for v in pack_sp), (
          "packed decoding needs stride-2 stages and an even grid at the "
          f"packing point (stage {pfs} input {pack_sp})")
    from corenet_tpu.models import packing

    # Fine-channel block structure of the CURRENT packed activation:
    # None = plain phase-major; (g0, g1) = block layout [8·g0 | 8·g1]
    # left by a packed skip concat (a free lane concat; the consuming
    # conv/renorm compensate via input_groups/phase_groups so no
    # [.., 8, C] reshuffle of the big tensor is ever materialized).
    blocked_groups = None

    def apply_skip(x, src2d, stage):
      nonlocal blocked_groups
      # Skip `stage` runs after tower `stage`, so it sees packed
      # activations iff that tower was packed.
      x_packed = packed and stage >= pfs
      if self._skip_channels(16) == 0 or stage == 1:
        return x
      skip_c = {2: 128, 3: 64, 4: 32, 5: 16}[stage]
      out_channels = self._skip_channels(skip_c)
      if out_channels == 0:
        return x
      b = src2d.shape[0]
      o = jnp.broadcast_to(
          voxel_sample_locations[:, None, None, :],
          (b, src2d.shape[1], src2d.shape[2], 3))
      src2d = jnp.concatenate([src2d, o], axis=-1)
      layer_res = x.shape[1:4]
      if x_packed:
        layer_res = tuple(2 * v for v in layer_res)  # fine resolution
      r = (jnp.array(self.resolution, jnp.float32) /
           jnp.array(layer_res, jnp.float32))
      layer_scale = jnp.diag(jnp.concatenate(
          [r, jnp.ones([1], jnp.float32)]))
      layer_matrix = voxel_projection_matrix @ layer_scale
      skip = SampleGrid2d(out_channels, tuple(layer_res),
                          compute_dtype=self.compute_dtype, packed=x_packed,
                          name=f"rt_skip_{stage}")(
                              src2d, layer_matrix, voxel_sample_locations)
      if x_packed:
        blocked_groups = (x.shape[-1] // 8, out_channels)
      return jnp.concatenate([x, skip], axis=-1)

    imf = image_features
    x = layers.Linear(self.latent_channels, name="stage_0",
                      compute_dtype=self.compute_dtype)(
        imf.global_average_2048)
    x = x.astype(jnp.float32)
    x = jnp.concatenate([x, voxel_sample_locations], axis=-1)
    x = x[:, None, None, None, :]  # [B, 1, 1, 1, latent+3]

    # stage_1: ReLU, BN, ConvT(latent+3 → 256) emitting the ir³ seed grid.
    # The reference hardcodes kernel 4 with stride=ir
    # (reconstruction_decoder.py:51-54); on a 1³ input a ConvTranspose's
    # output equals its kernel size, so the reference's seed is always 4³
    # and its decoder only produces 64·last_upscale_factor grids (128³ for
    # every trained config). Using kernel=ir is bit-identical there
    # (ir = 4) and makes every other configured resolution actually come
    # out of stage_6 at the configured size.
    x = nn.relu(x)
    x = _bn(name="stage_1_bn")(x, train)
    x = layers.ConvTranspose(256, ir, ndim=3, stride=ir,
                             compute_dtype=self.compute_dtype,
                             name="stage_1_t")(x)
    x = apply_skip(x, imf.stage5_2048, 1)

    def tower(x, stage, name, conv_c, conv_k, t_out, t_k, t_stride, t_pad,
              t_op, t_phase=False):
      nonlocal blocked_groups
      tp = packed and stage >= pfs
      if tp and stage == pfs:
        x = packing.space_to_depth(x)
      phase = 8 if tp else 1
      groups = blocked_groups if tp else None
      blocked_groups = None
      x = nn.relu(x)
      x = _bn(name=f"{name}_bn1", phase_packing=phase,
              phase_groups=groups)(x, train)
      x = layers.Conv(conv_c, conv_k, ndim=3, padding=conv_k // 2,
                      compute_dtype=self.compute_dtype, packed_io=tp,
                      input_groups=groups, name=f"{name}_c")(x)
      x = nn.relu(x)
      x = _bn(name=f"{name}_bn2", phase_packing=phase)(x, train)
      x = layers.ConvTranspose(t_out, t_k, ndim=3, stride=t_stride,
                               padding=t_pad, output_padding=t_op,
                               compute_dtype=self.compute_dtype,
                               packed_io=tp, phase_output=t_phase,
                               name=f"{name}_t")(x)
      return x

    x = tower(x, 2, "stage_2", 256, 3, 128, 3, 2, 1, 1)
    x = apply_skip(x, imf.stage5_2048, 2)
    x = tower(x, 3, "stage_3", 128, 5, 64, 7, 2, 3, 1)
    x = apply_skip(x, imf.stage4_1024, 3)
    x = tower(x, 4, "stage_4", 64, 5, 32, 7, 2, 3, 1)
    x = apply_skip(x, imf.stage3_512, 4)
    x = tower(x, 5, "stage_5", 32, 5, 16, 7, 2, 3, 1)
    x = apply_skip(x, imf.stage2_256, 5)
    fine_phase = (self.phase_output and not packed
                  and self.last_upscale_factor == 2)
    # Packed + phase_output: stage_6 also skips its rm-interleave and
    # emits the deep-phase [B, D/4, H/4, W/4, 64*C] layout; the train
    # step pairs it with the matching GT permutation (factor 64).
    t_phase = fine_phase or (packed and self.phase_output)
    x = tower(x, 6, "stage_6", 16, 5, self.num_output_channels, 7,
              self.last_upscale_factor, 3, 1, t_phase=t_phase)
    if packed:
      if self.phase_output:
        return x
      x = packing.depth_to_space(x, self.num_output_channels)
    elif fine_phase:
      # Same phase-major [B, D/2, H/2, W/2, 8*C] contract as the packed
      # phase_output: the final interleave to 128^3 (and its transposes)
      # is skipped; the training loss consumes this directly.
      return x
    return x.astype(jnp.float32)
