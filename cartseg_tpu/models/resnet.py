"""ResNet encoder family (ResNet-18/34 basic blocks), the TPU-native
equivalent of smp's torchvision-backed `resnet34` encoder
(train_bce_dice.py:293-301). Returns the 5 downsampled feature stages
the UNet decoder consumes. NHWC, BatchNorm with mutable batch_stats."""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cartseg_tpu.models.norm import batch_norm
from cartseg_tpu.models.stash import StashConv


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: batch_norm(not train, self.dtype, name)
        residual = x
        y = StashConv(self.features, (3, 3),
                      strides=(self.stride, self.stride),
                      padding=1, dtype=self.dtype, name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = StashConv(self.features, (3, 3), padding=1,
                      dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = StashConv(self.features, (1, 1),
                                 strides=(self.stride, self.stride),
                                 padding=0, dtype=self.dtype,
                                 name="downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """stage_sizes: blocks per layer — (3,4,6,3) = resnet34,
    (2,2,2,2) = resnet18. out_channels: (64, 64, 128, 256, 512)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    out_channels: Tuple[int, ...] = (64, 64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = []
        y = StashConv(64, (7, 7), strides=(2, 2), padding=3,
                      dtype=self.dtype, name="conv1")(x)
        y = batch_norm(not train, self.dtype, "bn1")(y)
        y = nn.relu(y)
        feats.append(y)  # stride 2, 64ch
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        widths = (64, 128, 256, 512)
        for li, (n_blocks, w) in enumerate(zip(self.stage_sizes, widths)):
            for bi in range(n_blocks):
                stride = 2 if (bi == 0 and li > 0) else 1
                y = BasicBlock(w, stride, self.dtype,
                               name=f"layer{li + 1}_{bi}")(y, train)
            feats.append(y)  # strides 4, 8, 16, 32
        return feats
