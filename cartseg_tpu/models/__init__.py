"""Model zoo (SURVEY.md section 2.6 replacement plan): Flax UNet with
pluggable ResNet-34 / EfficientNet-B0 encoders mirroring the smp.Unet
capability (smp.Unet(encoder_name=..., classes=1, activation=None) —
train_bce_dice.py:293-301, src/train_with_pretrained.py:317-325), plus
the hand-rolled classic UNet of the annotation tool
(src/create_testset.py:40-83). NHWC throughout; compute dtype is a
constructor knob (bfloat16 for TPU MXU, fp32 params)."""

from cartseg_tpu.models.unet import UNet, UNetDecoder, SegmentationHead
from cartseg_tpu.models.resnet import ResNetEncoder
from cartseg_tpu.models.efficientnet import EfficientNetEncoder
from cartseg_tpu.models.classic_unet import ClassicUNet
from cartseg_tpu.models.factory import build_model, init_model, param_groups
from cartseg_tpu.models.sam import (
    Sam, SamConfig, TpuSamPredictor, build_sam_vit_b, convert_torch_sam,
    load_tpu_sam,
)

__all__ = [
    "UNet", "UNetDecoder", "SegmentationHead",
    "ResNetEncoder", "EfficientNetEncoder", "ClassicUNet",
    "build_model", "init_model", "param_groups",
    "Sam", "SamConfig", "TpuSamPredictor", "build_sam_vit_b",
    "convert_torch_sam", "load_tpu_sam",
]
