"""UNet++ decoder (Zhou et al., arXiv:1912.05074 — PAPERS.md) as a
drop-in alternative to the plain UNet decoder: nested dense skip
connections X[i][j] = conv(concat(X[i][0..j-1], up(X[i+1][j-1]))).

A capability EXTENSION beyond the reference (which only ships smp.Unet)
— selected with build_model(..., decoder="unetpp"). Optional deep
supervision averages the X[0][j] heads.

fused=True routes every node's up2+concat+conv1 through
FusedUpsampleConv (models/unet.py) — identical math and params
(skip_first layout: the node's conv1 kernel sees [parts..., up] on its
input-channel axis), no 4x upsample buffer or concat in HBM.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from cartseg_tpu.models.norm import batch_norm

from cartseg_tpu.models.unet import (_upsample2x, FusedUpsampleConv,
                                     SegmentationHead)


class ConvBlock(nn.Module):
    """conv-bn-relu x2. When `up` is given (pre-upsample tensor) the
    first conv consumes concat([x_parts, up2(up)]) — fused (no
    materialized upsample/concat) iff self.fused."""

    features: int
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, up=None):
        norm = lambda name: batch_norm(not train, self.dtype, name)
        if up is not None and self.fused:
            x = FusedUpsampleConv(self.features, self.dtype,
                                  skip_first=True, name="conv1")(up, x)
        else:
            if up is not None:
                parts = ([] if x is None
                         else [x.astype(self.dtype)])
                x = jnp.concatenate(
                    parts + [_upsample2x(up).astype(self.dtype)], axis=-1)
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name="conv1")(x)
        x = nn.relu(norm("bn1")(x))
        x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(x)
        return nn.relu(norm("bn2")(x))


class UNetPlusPlusDecoder(nn.Module):
    """feats [c1(s2)..c5(s32)] -> full-resolution feature map."""

    channels: Sequence[int] = (16, 32, 64, 128, 256)  # per level i
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, feats, train: bool = False,
                 collect_nodes: bool = False):
        L = len(feats)  # 5 levels, strides 2..32
        grid = {(i, 0): feats[i] for i in range(L)}
        for j in range(1, L):
            for i in range(L - j):
                parts = [grid[(i, k)].astype(self.dtype)
                         for k in range(j)]
                skip = (parts[0] if len(parts) == 1
                        else jnp.concatenate(parts, axis=-1))
                grid[(i, j)] = ConvBlock(
                    self.channels[i], self.dtype, self.fused,
                    name=f"x_{i}_{j}")(skip, train,
                                       up=grid[(i + 1, j - 1)])
        # bring the top node (stride 2) to full resolution
        y = ConvBlock(self.channels[0], self.dtype, self.fused,
                      name="final")(None, train, up=grid[(0, L - 1)])
        if collect_nodes:
            # the intermediate top-row nodes X[0][1..L-2] (stride 2),
            # for deep supervision heads
            return y, [grid[(0, j)] for j in range(1, L - 1)]
        return y


class UNetPlusPlus(nn.Module):
    """deep_supervision=True averages a segmentation head over every
    top-row node X[0][j] (upsampled to input res) with the final head —
    the UNet++ paper's 'accurate mode' ensemble (arXiv:1912.05074 §2)."""

    encoder: nn.Module
    classes: int = 1
    dtype: jnp.dtype = jnp.float32
    deep_supervision: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = self.encoder(x.astype(self.dtype), train=train)
        dec = UNetPlusPlusDecoder(dtype=self.dtype, fused=self.fused,
                                  name="decoder")
        if not self.deep_supervision:
            y = dec(feats, train)
            return SegmentationHead(self.classes, self.dtype,
                                    name="segmentation_head")(y)
        y, nodes = dec(feats, train, collect_nodes=True)
        logits = SegmentationHead(self.classes, self.dtype,
                                  name="segmentation_head")(y)
        for j, node in enumerate(nodes):
            aux = SegmentationHead(self.classes, self.dtype,
                                   name=f"aux_head_{j + 1}")(
                _upsample2x(node))
            logits = logits + aux
        return logits / (1.0 + len(nodes))
