"""Model factory + param-group partitioning.

`build_model(encoder_name)` mirrors the reference build_model calls
(train_bce_dice.py:293-301 resnet34; src/train_with_pretrained.py:317-325
efficientnet-b0; src/create_testset.py:40-83 classic).

`param_groups` labels each param leaf encoder/decoder/head — the basis
for freeze phases and per-group LRs via optax.multi_transform,
replacing build_param_groups_for_smp (src/finetune_for_224.py:250-262).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from cartseg_tpu.models.unet import UNet
from cartseg_tpu.models.resnet import ResNetEncoder
from cartseg_tpu.models.efficientnet import EfficientNetEncoder
from cartseg_tpu.models.classic_unet import ClassicUNet


def build_model(encoder_name: str = "resnet34", classes: int = 1,
                dtype: jnp.dtype = jnp.float32,
                decoder: str = "unet",
                fused_decoder: Optional[bool] = None) -> nn.Module:
    """fused_decoder selects the transposed-conv decoder lane (same
    params, same math — models/unet.py:FusedUpsampleConv); default
    comes from CARTSEG_FUSED_DECODER (on unless set to '0': measured
    1.12-1.40x faster full train step at every benchmarked shape,
    docs/decoder_bench.json + docs/BENCHMARKS.md)."""
    if fused_decoder is None:
        fused_decoder = os.environ.get(
            "CARTSEG_FUSED_DECODER", "1") != "0"
    if encoder_name == "resnet34":
        enc = ResNetEncoder(stage_sizes=(3, 4, 6, 3), dtype=dtype,
                            name="encoder")
    elif encoder_name == "resnet18":
        enc = ResNetEncoder(stage_sizes=(2, 2, 2, 2), dtype=dtype,
                            name="encoder")
    elif encoder_name == "efficientnet-b0":
        enc = EfficientNetEncoder(dtype=dtype, name="encoder")
    elif encoder_name == "classic":
        return ClassicUNet(out_channels=classes, dtype=dtype)
    else:
        raise ValueError(f"unknown encoder {encoder_name!r}")
    if decoder in ("unetpp", "unetpp_ds"):
        from cartseg_tpu.models.unetpp import UNetPlusPlus
        return UNetPlusPlus(encoder=enc, classes=classes, dtype=dtype,
                            deep_supervision=(decoder == "unetpp_ds"),
                            fused=fused_decoder)
    return UNet(encoder=enc, classes=classes, dtype=dtype,
                fused_decoder=fused_decoder)


def init_model(model: nn.Module, rng: jax.Array,
               input_shape: Tuple[int, int, int, int] = (1, 224, 224, 3)
               ) -> Dict[str, Any]:
    """Returns {'params': ..., 'batch_stats': ...} variables.

    init is jitted: eager flax init dispatches every layer op
    individually (~90s for the resnet UNet); one fused compile takes
    a couple of seconds."""
    x = jnp.zeros(input_shape, jnp.float32)
    return jax.jit(lambda r: model.init(r, x, train=False))(rng)


def param_groups(params) -> Any:
    """Pytree of labels ('encoder'|'decoder'|'head') shaped like params,
    for optax.multi_transform."""
    def label_of(path) -> str:
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        if top == "encoder":
            return "encoder"
        if top == "segmentation_head" or top.startswith("aux_head"):
            return "head"
        return "decoder"

    return jax.tree_util.tree_map_with_path(
        lambda path, _: label_of(path), params)
