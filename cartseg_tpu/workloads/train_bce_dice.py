"""Baseline BCE+Dice training — reference train_bce_dice.py:
smp.Unet/resnet34, 512^2, BCE+Dice(w=0.5), AdamW 1e-4/wd 1e-4, cosine,
early stop patience 7, session-sorted 80/20 split, NO ImageNet
normalization (:173), best-Dice checkpoint, CSV metrics, end-of-run
threshold search over linspace(0.2, 0.8, 13) (:215)."""

from cartseg_tpu.train import TrainConfig, LossSpec
from cartseg_tpu.workloads._runner import run

CONFIG = TrainConfig(
    encoder="resnet34",
    img_size=(512, 512),
    imagenet_norm=False,
    batch_size=6,
    epochs=50,
    lr=1e-4,
    weight_decay=1e-4,
    patience=7,
    loss=LossSpec("bce_dice", {"bce_weight": 0.5, "smooth": 1.0}),
    augment="train_512",
    split="session_sorted",
    metrics_schema="basic",
    threshold_sweep=(0.2, 0.8, 13),
    out_dir="runs/train_bce_dice",
)

if __name__ == "__main__":
    run(CONFIG)
