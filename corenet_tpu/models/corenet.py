"""Top-level CoreNet model: image → 3D voxel-grid logits.

Mirrors /root/reference/src/corenet/model/core_net.py:25-61. Inputs are
channel-last: uint8 image [B, H, W, 3], voxel→screen matrix [B, 4, 4],
grid sampling offsets [B, 3]. Output: logits [B, D, H, W, C].
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from corenet_tpu.models.decoder import ReconstructionDecoder
from corenet_tpu.models.resnet50 import (
    ResNet50FeatureExtractor,
    preprocess_image_caffe,
)


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
  """Decoder hyper-parameters (configuration.py:277-294)."""
  resolution: Tuple[int, int, int]  # (depth, height, width)
  num_output_channels: int
  last_upscale_factor: int = 2
  latent_channels: int = 64
  skip_fraction: float = 0.75


@dataclasses.dataclass(frozen=True)
class CoreNetConfig:
  decoder: DecoderConfig


class CoreNet(nn.Module):
  config: CoreNetConfig
  # None → float32 everywhere (bit-parity mode); jnp.bfloat16 → conv/matmul
  # compute in bf16 with float32 parameters, stats, and output logits.
  compute_dtype: Any = None
  # Space-to-depth decoder execution (models/packing.py): same parameters
  # and math, substantially better MXU utilization on TPU.
  packed_decoder: bool = False
  # First decoder tower executed packed (see ReconstructionDecoder).
  pack_from_stage: int = 5
  # With packed_decoder: emit phase-packed logits (see
  # ReconstructionDecoder.phase_output) for the training-loss fast path.
  phase_output: bool = False

  def setup(self):
    # Attribute names pin the parameter scopes ("encoder"/"decoder") —
    # the tree is identical to the original single-compact layout, so
    # checkpoints and importers are unaffected.
    dc = self.config.decoder
    self.encoder = ResNet50FeatureExtractor(compute_dtype=self.compute_dtype)
    self.decoder = ReconstructionDecoder(
        resolution=tuple(dc.resolution),
        num_output_channels=dc.num_output_channels,
        last_upscale_factor=dc.last_upscale_factor,
        latent_channels=dc.latent_channels,
        skip_fraction=dc.skip_fraction,
        compute_dtype=self.compute_dtype,
        packed=self.packed_decoder,
        pack_from_stage=self.pack_from_stage,
        phase_output=self.phase_output)

  def __call__(self, image: jnp.ndarray,
               voxel_projection_matrix: jnp.ndarray,
               voxel_sample_locations: jnp.ndarray,
               train: bool = False) -> jnp.ndarray:
    """Forward pass.

    Args:
      image: uint8[B, H, W, 3] RGB input render.
      voxel_projection_matrix: float32[B, 4, 4], voxel → screen.
      voxel_sample_locations: float32[B, 3], in-voxel sample offsets.
      train: Whether batch statistics are updated (mutable 'batch_stats').

    Returns:
      Grid logits, float32[B, depth, height, width, num_output_channels].
    """
    return self.decode(self.encode(image, train), voxel_projection_matrix,
                       voxel_sample_locations, train)

  def encode(self, image: jnp.ndarray, train: bool = False):
    """The offset-invariant half: uint8 image → ResNet50Features.

    Exposed separately (apply(..., method="encode")) so multi-pass
    inference — super-resolution's m³ shifted offsets — encodes the
    image ONCE and maps only `decode` over the offset lattice; the
    reference re-runs the full network per offset
    (super_resolution.py:92-112)."""
    return self.encoder(preprocess_image_caffe(image), train)

  def decode(self, features, voxel_projection_matrix: jnp.ndarray,
             voxel_sample_locations: jnp.ndarray,
             train: bool = False) -> jnp.ndarray:
    """ResNet50Features + voxel→screen + in-voxel offsets → grid logits."""
    return self.decoder(features, voxel_projection_matrix,
                        voxel_sample_locations, train)
