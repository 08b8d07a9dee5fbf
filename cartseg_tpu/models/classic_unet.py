"""The hand-rolled classic UNet used by the annotation tools as the
proposal model (src/create_testset.py:40-83): DoubleConv stacks
64->128->256->512->1024, ConvTranspose decoder, 1x1 head, sigmoid
output (this model returns PROBABILITIES, unlike the smp models)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class DoubleConv(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in (1, 2):
            x = nn.Conv(self.features, (3, 3), padding=1,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
        return x


class ClassicUNet(nn.Module):
    out_channels: int = 1
    base: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # no normalization layers in the classic UNet
        widths = [self.base * m for m in (1, 2, 4, 8)]
        skips = []
        y = x.astype(self.dtype)
        for i, w in enumerate(widths):
            y = DoubleConv(w, self.dtype, name=f"down{i}")(y)
            skips.append(y)
            y = nn.max_pool(y, (2, 2), strides=(2, 2))
        y = DoubleConv(self.base * 16, self.dtype, name="bottleneck")(y)
        for i, w in enumerate(reversed(widths)):
            y = nn.ConvTranspose(w, (2, 2), strides=(2, 2),
                                 dtype=self.dtype, name=f"up{i}")(y)
            y = jnp.concatenate([skips[-(i + 1)].astype(y.dtype), y], axis=-1)
            y = DoubleConv(w, self.dtype, name=f"updc{i}")(y)
        y = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name="head")(y)
        return nn.sigmoid(y.astype(jnp.float32))
