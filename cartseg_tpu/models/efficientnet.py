"""EfficientNet-B0 encoder — the TPU-native equivalent of smp's timm
`efficientnet-b0` encoder, the reference's main backbone
(src/train_with_pretrained.py:317-325 and every later script).

Standard B0 architecture (MBConv w/ squeeze-excite, SiLU); returns the
5 feature stages at strides 2/4/8/16/32 with channels 32/24/40/112/320,
matching smp's stage cut points. NHWC; depthwise convs use
feature_group_count (XLA lowers them to efficient TPU convolutions).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from cartseg_tpu.models.norm import batch_norm

# (expand_ratio, out_channels, num_repeats, stride, kernel_size)
_B0_BLOCKS = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)
# block-groups after which smp cuts an encoder stage (stride boundaries);
# the final 320ch stage is appended after the loop
_STAGE_ENDS = (1, 2, 4)


class MBConv(nn.Module):
    in_ch: int
    out_ch: int
    expand: int
    stride: int
    kernel: int
    se_ratio: float = 0.25
    drop_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: batch_norm(not train, self.dtype, name,
                                       epsilon=1e-3)
        mid = self.in_ch * self.expand
        y = x
        if self.expand != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(y)
            y = nn.silu(norm("expand_bn")(y))
        # depthwise
        y = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=self.kernel // 2, feature_group_count=mid,
                    use_bias=False, dtype=self.dtype, name="dw_conv")(y)
        y = nn.silu(norm("dw_bn")(y))
        # squeeze-excite on the *input* channel count (timm convention)
        se_ch = max(1, int(self.in_ch * self.se_ratio))
        s = jnp.mean(y, axis=(1, 2), keepdims=True)
        s = nn.Conv(se_ch, (1, 1), dtype=self.dtype, name="se_reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(mid, (1, 1), dtype=self.dtype, name="se_expand")(s)
        y = y * nn.sigmoid(s)
        # project
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(y)
        y = norm("project_bn")(y)
        if self.stride == 1 and self.in_ch == self.out_ch:
            if self.drop_rate > 0:
                y = nn.Dropout(self.drop_rate, broadcast_dims=(1, 2, 3),
                               deterministic=not train)(y)
            y = y + x
        return y


class EfficientNetEncoder(nn.Module):
    dtype: jnp.dtype = jnp.float32
    drop_path_rate: float = 0.0  # stochastic depth (timm default 0.2)

    out_channels: Tuple[int, ...] = (32, 24, 40, 112, 320)

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: batch_norm(not train, self.dtype, name,
                                       epsilon=1e-3)
        feats = []
        y = nn.Conv(32, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        y = nn.silu(norm("stem_bn")(y))
        feats.append(y)  # stride 2, 32ch

        in_ch = 32
        total = sum(b[2] for b in _B0_BLOCKS)
        bidx = 0
        for gi, (exp, out_ch, reps, stride, k) in enumerate(_B0_BLOCKS):
            for r in range(reps):
                dr = self.drop_path_rate * bidx / total
                y = MBConv(in_ch, out_ch, exp, stride if r == 0 else 1, k,
                           drop_rate=dr, dtype=self.dtype,
                           name=f"block{gi}_{r}")(y, train)
                in_ch = out_ch
                bidx += 1
            if gi in _STAGE_ENDS:
                feats.append(y)  # strides 4, 8, 16 cut points
        feats.append(y)  # final, stride 32, 320ch
        return feats
