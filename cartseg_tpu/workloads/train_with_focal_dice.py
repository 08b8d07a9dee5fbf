"""Focal-Dice training — reference src/train_with_focalDice.py:
FocalDice(alpha=0.5, gamma=2, w_focal=0.7) (:381), frozen->unfrozen
encoder schedule with PHASE1_EPOCHS=8 (:407-420), efficientnet-b0,
ImageNet norm."""

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
    loss=LossSpec("focal_dice",
                  {"alpha": 0.5, "gamma": 2.0, "w_focal": 0.7}),
    augment="train_512",
    freeze_encoder_epochs=8,
    unfreeze_encoder_lr_scale=0.3,
    metrics_schema="prf1",
    out_dir="runs/train_with_focal_dice",
)

if __name__ == "__main__":
    run(CONFIG)
