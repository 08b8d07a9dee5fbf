"""The loss zoo — every loss the reference implements (inline Python
classes plus the vendored `lsr_cpp` CUDA kernel collection), rebuilt as
fused jit/XLA math with custom VJPs mirroring each hand-written
backward. SURVEY.md sections 2.3-2.4 is the inventory.

Two tiers:
  * Tier A (this package): pure jax.numpy reference implementations —
    the oracles, and already fast because XLA fuses elementwise+reduce
    chains into single kernels on TPU.
  * Tier B (:mod:`cartseg_tpu.ops.pallas`): hand-written Pallas TPU
    kernels for the ops whose CUDA counterparts exist in the reference
    (`lsr_kernel.cu` etc.); each is parity-tested against Tier A.
"""

from cartseg_tpu.losses.region import (
    bce_with_logits,
    bce_dice_loss,
    bce_dice_per_sample,
    focal_loss,
    focal_loss_kernel,
    focal_dice_loss,
    soft_dice_loss,
)
from cartseg_tpu.losses.label_smooth import (
    smooth_one_hot,
    lsr_cross_entropy,
    lsr_cross_entropy_fused,
)
from cartseg_tpu.losses.activations import mish, swish, hswish
from cartseg_tpu.losses.taylor_softmax import (
    taylor_softmax,
    log_taylor_softmax,
    taylor_cross_entropy,
)
from cartseg_tpu.losses.ohem import ohem_labels
from cartseg_tpu.losses.lovasz import lovasz_softmax, lovasz_hinge
from cartseg_tpu.losses.large_margin import large_margin_softmax
from cartseg_tpu.losses.layer_norm import layer_norm
from cartseg_tpu.losses.boundary import (
    signed_distance_map,
    symmetric_boundary_loss,
    composite_seg_loss,
)
from cartseg_tpu.losses.abl import active_boundary_loss, bce_dice_abl

__all__ = [
    "bce_with_logits", "bce_dice_loss", "bce_dice_per_sample",
    "focal_loss", "focal_loss_kernel", "focal_dice_loss", "soft_dice_loss",
    "smooth_one_hot", "lsr_cross_entropy", "lsr_cross_entropy_fused",
    "mish", "swish", "hswish",
    "taylor_softmax", "log_taylor_softmax", "taylor_cross_entropy",
    "ohem_labels", "lovasz_softmax", "lovasz_hinge",
    "large_margin_softmax", "layer_norm",
    "signed_distance_map", "symmetric_boundary_loss", "composite_seg_loss",
    "active_boundary_loss", "bce_dice_abl",
]
