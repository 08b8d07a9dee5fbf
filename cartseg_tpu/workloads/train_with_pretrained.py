"""Pretrained-encoder training — reference src/train_with_pretrained.py:
efficientnet-b0 encoder, ImageNet normalization (:164-165), two-phase
schedule (freeze encoder 8 epochs, then unfreeze at LR x 0.3,
:335-372), P/R/F1 metrics CSV (:218-236, :350-356)."""

from cartseg_tpu.train import TrainConfig, LossSpec
from cartseg_tpu.workloads._runner import run

CONFIG = TrainConfig(
    encoder="efficientnet-b0",
    img_size=(512, 512),
    imagenet_norm=True,
    batch_size=6,
    epochs=50,
    lr=1e-4,
    weight_decay=1e-4,
    patience=8,
    loss=LossSpec("bce_dice", {"bce_weight": 0.5, "smooth": 1.0}),
    augment="train_512",
    split="session_sorted",
    freeze_encoder_epochs=8,
    unfreeze_encoder_lr_scale=0.3,
    metrics_schema="prf1",
    out_dir="runs/train_with_pretrained",
)

if __name__ == "__main__":
    run(CONFIG)
