"""SDF boundary-loss training — reference src/train_with_boundary_loss.py:
(1-0.3)*(BCE+Dice) + 0.3*SymmetricBoundaryLoss (:267-282), efficientnet
encoder, ImageNet norm. The SDFs build on device (jump-flood EDT)
instead of per-sample CPU scipy (:204-217)."""

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
    loss=LossSpec("boundary", {"bce_weight": 0.5, "boundary_weight": 0.3}),
    augment="train_512",
    freeze_encoder_epochs=8,
    unfreeze_encoder_lr_scale=0.3,
    metrics_schema="prf1",
    out_dir="runs/train_with_boundary_loss",
)

if __name__ == "__main__":
    run(CONFIG)
