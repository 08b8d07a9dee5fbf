"""UNet decoder + segmentation head, mirroring smp.Unet's architecture
(decoder_channels (256,128,64,32,16), nearest-upsample + double
conv-BN-relu blocks, 3x3 head conv) so ImageNet-pretrained reference
checkpoints convert 1:1, while staying NHWC/TPU-native.

The full model exposes `encoder` / `decoder` / `segmentation_head`
param subtrees so the reference's freeze & LR-tier logic
(src/finetune_for_224.py:250-272) maps onto optax.multi_transform
partitions.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _upsample2x(x):
    """Nearest-neighbor 2x upsample (smp decoder's interpolate)."""
    B, H, W, C = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class DecoderBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        x = _upsample2x(x)
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        for i in (1, 2):
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class UNetDecoder(nn.Module):
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats: encoder stages [c1(s2) ... c5(s32)]; returns full-res
        feature map. Last block has no skip (input-resolution level)."""
        head, *skips = feats[::-1]  # c5; [c4, c3, c2, c1]
        x = head
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            x = DecoderBlock(ch, self.dtype, name=f"block{i}")(x, skip, train)
        return x


class SegmentationHead(nn.Module):
    classes: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.classes, (3, 3), padding=1,
                       dtype=self.dtype, name="conv")(x).astype(jnp.float32)


class UNet(nn.Module):
    """encoder + UNetDecoder + head. logits out, [B,H,W,classes] fp32
    (activation=None as in every reference build_model)."""

    encoder: nn.Module
    classes: int = 1
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = self.encoder(x.astype(self.dtype), train=train)
        y = UNetDecoder(self.decoder_channels, self.dtype,
                        name="decoder")(feats, train)
        return SegmentationHead(self.classes, self.dtype,
                                name="segmentation_head")(y)
