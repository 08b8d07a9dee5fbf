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

from cartseg_tpu.models.norm import batch_norm
from cartseg_tpu.models.stash import StashConv


def _upsample2x(x):
    """Nearest-neighbor 2x upsample (smp decoder's interpolate) as one
    broadcast+reshape (a single fused relayout, vs two materializing
    `jnp.repeat` passes)."""
    B, H, W, C = x.shape
    return jnp.broadcast_to(x[:, :, None, :, None, :],
                            (B, H, 2, W, 2, C)).reshape(B, 2 * H, 2 * W, C)


# Row map for the up2+conv3 fusion: output row parity selects which
# 2 of these 4 taps are live; M[r, u] says how kernel row u contributes
# to transposed-kernel row r (derivation in FusedUpsampleConv).
_UPCONV_M = ((1, 0, 0), (1, 1, 0), (0, 1, 1), (0, 0, 1))

_DN = ("NHWC", "HWIO", "NHWC")


@jax.custom_vjp
def _upconv2x(x, k4):
    """stride-2 transposed conv (lhs_dilation=2, pad 2) with a 4x4
    kernel — the fused up2+conv3 core. Custom VJP: XLA's autodiff of an
    lhs-dilated conv emits full-tensor spatial `reverse` ops on the
    gradient path (~8.7 ms/step at 512^2, docs/step_trace.json); both
    gradients are plain convolutions when written directly —
      dx: stride-2 conv of dy with the flipped/transposed kernel,
      dk: batch-contracting conv of x (dilated) with dy, expressed via
          dimension_numbers so no big-tensor transpose materializes."""
    return jax.lax.conv_general_dilated(
        x, k4, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=_DN)


def _upconv2x_fwd(x, k4):
    return _upconv2x(x, k4), (x, k4)


def _upconv2x_bwd(res, dy):
    x, k4 = res
    # dx[i] = sum_u dy[2i+u] k4[2-u]  (u in -1..2) -> stride-2 conv,
    # pad (1,2), kernel flipped on both spatial axes, io-transposed
    kT = jnp.transpose(k4[::-1, ::-1], (0, 1, 3, 2))
    dx = jax.lax.conv_general_dilated(
        dy, kT, window_strides=(2, 2), padding=((1, 2), (1, 2)),
        dimension_numbers=_DN)
    # dk4[r,s,ci,co] = sum_{b,m,n} xdil_pad[b, m+r-2, n+s-2, ci] dy[b,m,n,co]
    # = conv(lhs=x as C<->N swapped, rhs=dy as I=batch, O=co)
    dk = jax.lax.conv_general_dilated(
        x, dy, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("CHWN", "IHWO", "NHWC"))
    return dx, jnp.transpose(dk, (1, 2, 0, 3))


_upconv2x.defvjp(_upconv2x_fwd, _upconv2x_bwd)


class FusedUpsampleConv(nn.Module):
    """`conv3x3(concat([up2(x), skip]))` without materializing either
    the 4x-size upsampled buffer or the concat — the decoder's two
    HBM-bandwidth hazards at 224²/512² (they dominate decoder time; see
    docs/step_profile.json).

    Identity used: for nearest-2x upsample U[m,n] = x[m//2, n//2] and a
    zero-padded 3x3 conv, out[2i+di] only sees x rows {i-1+di, i+di}
    with weights (row axis shown) W0 / W1+W2 for di=0 and W0+W1 / W2
    for di=1 — i.e. a stride-2 TRANSPOSED conv with the 4x4 kernel
    K[r,s] = sum_{u,v} M[r,u] M[s,v] W[u,v] (M above), which is exact
    (incl. zero borders) and does 4 MACs/output instead of 9 on a 4x
    bigger input. The skip half of the concat becomes its own 3x3 conv
    on the skip tensor, summed — bitwise the same math as slicing the
    kernel of the concat conv.

    The single `kernel` param has the SAME name/shape as the nn.Conv it
    replaces ((3,3,C_up+C_skip,features), name 'conv1' in DecoderBlock),
    so checkpoints and the torch importer are unaffected.

    skip_first selects the concat order the kernel's input-channel axis
    was laid out for: False -> concat([up2(x), skip]) (UNet decoder),
    True -> concat([skip, up2(x)]) (UNet++ nodes, unetpp.py).
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    skip_first: bool = False

    @nn.compact
    def __call__(self, x, skip=None):
        cu = x.shape[-1]
        cs = 0 if skip is None else skip.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cu + cs, self.features), jnp.float32)
        k = kernel.astype(self.dtype)
        if self.skip_first:
            k_skip, k_up = k[:, :, :cs], k[:, :, cs:]
        else:
            k_up, k_skip = k[:, :, :cu], k[:, :, cu:]
        m = jnp.asarray(_UPCONV_M, self.dtype)
        k4 = jnp.einsum("ru,sv,uvio->rsio", m, m, k_up)
        dn = _DN
        # Measured dead-even with autodiff on-chip (130.4 ms/step both
        # lanes, full 512^2 step — XLA canonicalizes to the same convs;
        # docs/BENCHMARKS.md), so autodiff stays the default; the
        # custom lane is kept as the parity-tested experiment.
        import os
        from cartseg_tpu.models.stash import conv_f8stash, stash_min_hw
        min_hw = stash_min_hw()

        def stash_up(x):
            # output spatial = 2x input: gate on the OUTPUT size so the
            # decision matches the equivalent plain-decoder conv1
            return min_hw and 2 * min(x.shape[1], x.shape[2]) >= min_hw

        if os.environ.get("CARTSEG_UPCONV_VJP", "0") != "0":
            y = _upconv2x(x.astype(self.dtype), k4)
        elif stash_up(x):
            y = conv_f8stash(x.astype(self.dtype), k4, (1, 1),
                             ((2, 2), (2, 2)), (2, 2))
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), k4, window_strides=(1, 1),
                padding=((2, 2), (2, 2)), lhs_dilation=(2, 2),
                dimension_numbers=dn)
        if skip is not None:
            s = skip.astype(self.dtype)
            if min_hw and min(s.shape[1], s.shape[2]) >= min_hw:
                y = y + conv_f8stash(s, k_skip, (1, 1),
                                     ((1, 1), (1, 1)), (1, 1))
            else:
                y = y + jax.lax.conv_general_dilated(
                    s, k_skip, window_strides=(1, 1),
                    padding=((1, 1), (1, 1)), dimension_numbers=dn)
        return y


class DecoderBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        norm = lambda name: batch_norm(not train, self.dtype, name)
        if self.fused:
            x = FusedUpsampleConv(self.features, self.dtype,
                                  name="conv1")(x, skip)
        else:
            x = _upsample2x(x)
            if skip is not None:
                x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            x = StashConv(self.features, (3, 3), padding=1,
                          dtype=self.dtype, name="conv1")(x)
        x = nn.relu(norm("bn1")(x))
        x = StashConv(self.features, (3, 3), padding=1,
                      dtype=self.dtype, name="conv2")(x)
        return nn.relu(norm("bn2")(x))


class UNetDecoder(nn.Module):
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats: encoder stages [c1(s2) ... c5(s32)]; returns full-res
        feature map. Last block has no skip (input-resolution level)."""
        head, *skips = feats[::-1]  # c5; [c4, c3, c2, c1]
        x = head
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            x = DecoderBlock(ch, self.dtype, self.fused,
                             name=f"block{i}")(x, skip, train)
        return x


class SegmentationHead(nn.Module):
    classes: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return StashConv(self.classes, (3, 3), padding=1, use_bias=True,
                         dtype=self.dtype,
                         name="conv")(x).astype(jnp.float32)


class UNet(nn.Module):
    """encoder + UNetDecoder + head. logits out, [B,H,W,classes] fp32
    (activation=None as in every reference build_model)."""

    encoder: nn.Module
    classes: int = 1
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: jnp.dtype = jnp.float32
    fused_decoder: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        from jax.ad_checkpoint import checkpoint_name

        feats = self.encoder(x.astype(self.dtype), train=train)
        # pure metadata unless a jax.checkpoint policy references the
        # names: lets callers run segment-wise remat that saves ONLY
        # the stage boundaries (benchmarks/remat_bench.py 'stages' lane)
        feats = [checkpoint_name(f, f"enc_stage{i}")
                 for i, f in enumerate(feats)]
        y = UNetDecoder(self.decoder_channels, self.dtype,
                        self.fused_decoder, name="decoder")(feats, train)
        y = checkpoint_name(y, "decoder_out")
        return SegmentationHead(self.classes, self.dtype,
                                name="segmentation_head")(y)
