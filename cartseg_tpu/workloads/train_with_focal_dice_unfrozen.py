"""Focal-Dice, never-frozen variant — reference
src/train_with_focalDice_unfrozen.py: three LR tiers from the start
(encoder LR x 0.1, decoder LR, head LR x 3 — :389-391); per-group LRs
logged to CSV."""

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
    freeze_encoder_epochs=0,
    encoder_lr_scale=0.1,
    head_lr_scale=3.0,
    metrics_schema="prf1",
    out_dir="runs/train_with_focal_dice_unfrozen",
)

if __name__ == "__main__":
    run(CONFIG)
