"""Keras-layout ResNet-50 feature extractor, NHWC, flax.

Mirrors the reference extractor exactly in structure and tap points
(/root/reference/src/corenet/model/resnet50.py:118-186): six outputs —
stage1 conv output (pre-BN/ReLU) at 64×128², stages 2..5 pre-ReLU residual
outputs at 256×64², 512×32², 1024×16², 2048×8², and the global average
2048 vector. BatchRenorm (eps=1e-3) everywhere instead of BatchNorm.

Caffe-style preprocessing reproduces the reference's exact arithmetic,
including its sign: RGB→BGR flip then *adding* (103.939, 116.779, 123.68)
(resnet50.py:189-204). The published checkpoints were trained with this,
so it must match bit-for-bit.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import flax.linen as nn
import jax.numpy as jnp

from corenet_tpu.models import layers
from corenet_tpu.models.batch_renorm import BatchRenorm


class ResNet50Features(NamedTuple):
  stage1_64: jnp.ndarray      # [B, 128, 128, 64]
  stage2_256: jnp.ndarray     # [B, 64, 64, 256]
  stage3_512: jnp.ndarray     # [B, 32, 32, 512]
  stage4_1024: jnp.ndarray    # [B, 16, 16, 1024]
  stage5_2048: jnp.ndarray    # [B, 8, 8, 2048]
  global_average_2048: jnp.ndarray  # [B, 2048]


def _bn(name=None):
  return BatchRenorm(eps=1e-3, name=name)


def _conv_(features, kernel_size, stride=1, padding=0, name=None, dtype=None):
  return layers.Conv(features=features, kernel_size=kernel_size, ndim=2,
                     stride=stride, padding=padding,
                     kernel_init_mode="kaiming_normal", name=name,
                     compute_dtype=dtype)


class IdentityBlock(nn.Module):
  kernel_size: int
  filters: Tuple[int, int, int]
  compute_dtype: Any = None

  @nn.compact
  def __call__(self, x: jnp.ndarray, train: bool):
    f1, f2, f3 = self.filters
    inp = x
    _conv = functools.partial(_conv_, dtype=self.compute_dtype)
    x = _conv(f1, 1, name="conv_a")(x)
    x = _bn(name="bn_a")(x, train)
    x = nn.relu(x)
    x = _conv(f2, self.kernel_size, padding=self.kernel_size // 2,
              name="conv_b")(x)
    x = _bn(name="bn_b")(x, train)
    x = nn.relu(x)
    x = _conv(f3, 1, name="conv_c")(x)
    x = _bn(name="bn_c")(x, train)
    before_relu = x + inp
    return nn.relu(before_relu), before_relu


class DownscaleBlock(nn.Module):
  kernel_size: int
  filters: Tuple[int, int, int]
  stride: int = 2
  compute_dtype: Any = None

  @nn.compact
  def __call__(self, x: jnp.ndarray, train: bool):
    f1, f2, f3 = self.filters
    _conv = functools.partial(_conv_, dtype=self.compute_dtype)
    s = _conv(f3, 1, stride=self.stride, name="conv_shortcut")(x)
    s = _bn(name="bn_shortcut")(s, train)
    x = _conv(f1, 1, stride=self.stride, name="conv_a")(x)
    x = _bn(name="bn_a")(x, train)
    x = nn.relu(x)
    x = _conv(f2, self.kernel_size, padding=self.kernel_size // 2,
              name="conv_b")(x)
    x = _bn(name="bn_b")(x, train)
    x = nn.relu(x)
    x = _conv(f3, 1, name="conv_c")(x)
    x = _bn(name="bn_c")(x, train)
    return nn.relu(x + s)


class ResNet50FeatureExtractor(nn.Module):
  compute_dtype: Any = None

  @nn.compact
  def __call__(self, image: jnp.ndarray, train: bool) -> ResNet50Features:
    """image: float32[B, H, W, 3], Caffe-preprocessed."""
    _conv = functools.partial(_conv_, dtype=self.compute_dtype)
    x = stage1 = _conv(64, 7, stride=2, padding=3, name="stage1_conv")(image)
    x = _bn(name="stage1_bn")(x, train)
    x = nn.relu(x)
    x = layers.max_pool_2d(x, kernel=3, stride=2, padding=1)

    x = DownscaleBlock(3, (64, 64, 256), stride=1, name="stage2a", compute_dtype=self.compute_dtype)(x, train)
    x, _ = IdentityBlock(3, (64, 64, 256), name="stage2b", compute_dtype=self.compute_dtype)(x, train)
    x, stage2 = IdentityBlock(3, (64, 64, 256), name="stage2c", compute_dtype=self.compute_dtype)(x, train)

    x = DownscaleBlock(3, (128, 128, 512), name="stage3a", compute_dtype=self.compute_dtype)(x, train)
    x, _ = IdentityBlock(3, (128, 128, 512), name="stage3b", compute_dtype=self.compute_dtype)(x, train)
    x, _ = IdentityBlock(3, (128, 128, 512), name="stage3c", compute_dtype=self.compute_dtype)(x, train)
    x, stage3 = IdentityBlock(3, (128, 128, 512), name="stage3d", compute_dtype=self.compute_dtype)(x, train)

    x = DownscaleBlock(3, (256, 256, 1024), name="stage4a", compute_dtype=self.compute_dtype)(x, train)
    x, _ = IdentityBlock(3, (256, 256, 1024), name="stage4b", compute_dtype=self.compute_dtype)(x, train)
    x, _ = IdentityBlock(3, (256, 256, 1024), name="stage4c", compute_dtype=self.compute_dtype)(x, train)
    x, _ = IdentityBlock(3, (256, 256, 1024), name="stage4d", compute_dtype=self.compute_dtype)(x, train)
    x, _ = IdentityBlock(3, (256, 256, 1024), name="stage4e", compute_dtype=self.compute_dtype)(x, train)
    x, stage4 = IdentityBlock(3, (256, 256, 1024), name="stage4f", compute_dtype=self.compute_dtype)(x, train)

    x = DownscaleBlock(3, (512, 512, 2048), name="stage5a", compute_dtype=self.compute_dtype)(x, train)
    x, _ = IdentityBlock(3, (512, 512, 2048), name="stage5b", compute_dtype=self.compute_dtype)(x, train)
    x, stage5 = IdentityBlock(3, (512, 512, 2048), name="stage5c", compute_dtype=self.compute_dtype)(x, train)

    avg_pool = jnp.mean(x, axis=(1, 2))
    return ResNet50Features(stage1, stage2, stage3, stage4, stage5, avg_pool)


def preprocess_image_caffe(image: jnp.ndarray) -> jnp.ndarray:
  """uint8[B, H, W, 3] RGB → float32 BGR with the reference's constants
  ADDED (not subtracted — resnet50.py:201-203; reproduce exactly)."""
  assert image.dtype == jnp.uint8 and image.ndim == 4 and image.shape[-1] == 3
  image = image.astype(jnp.float32)
  image = image[..., ::-1]  # RGB → BGR
  return image + jnp.array([103.939, 116.779, 123.68], jnp.float32)
