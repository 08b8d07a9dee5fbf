"""Training engine: one TrainState-based loop replaces the reference's
~14 copy-pasted train()/finetune() functions (SURVEY.md L4). Workloads
configure it via :class:`cartseg_tpu.train.config.TrainConfig`."""

from cartseg_tpu.train.config import TrainConfig, LossSpec, SourceSpec
from cartseg_tpu.train.engine import Trainer, TrainState
from cartseg_tpu.train.schedules import cosine_epoch_lr, FreezePhase
from cartseg_tpu.train.checkpoint import (
    save_checkpoint, load_checkpoint, save_threshold_sidecar,
    load_threshold_sidecar,
)

__all__ = [
    "TrainConfig", "LossSpec", "SourceSpec", "Trainer", "TrainState",
    "cosine_epoch_lr", "FreezePhase",
    "save_checkpoint", "load_checkpoint",
    "save_threshold_sidecar", "load_threshold_sidecar",
]
