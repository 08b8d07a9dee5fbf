"""Fine-tune from a pseudo checkpoint on clean+hard with hard
oversampling x2 — reference src/finetune_pseudo_hard_clean.py:
WeightedRandomSampler doubling hard samples (:186-187), 3-group LRs
with encoder x 0.3 (:202-206), JSON metrics history (:209, 239-244).
Point --init_checkpoint (or --init_torch_checkpoint for a reference
.pth) at the pseudo-trained model."""

from cartseg_tpu.train import TrainConfig, LossSpec, SourceSpec
from cartseg_tpu.workloads._runner import run

CONFIG = TrainConfig(
    encoder="efficientnet-b0",
    img_size=(512, 512),
    imagenet_norm=True,
    batch_size=6,
    epochs=30,
    lr=1e-4,
    encoder_lr_scale=0.3,
    weight_decay=1e-4,
    patience=6,
    seed=42,
    loss=LossSpec("bce_dice_per_sample", {"bce_weight": 0.5, "smooth": 1.0}),
    augment="train_512",
    sources=[
        SourceSpec("hard", "data/hard/images", "data/hard/masks",
                   ratio=1.0, loss_weight=1.0, oversample=2.0),
        SourceSpec("clean", "data/clean/images", "data/clean/masks",
                   ratio=1.0, loss_weight=1.0),
    ],
    val_source="hard",
    val_frac=0.12,
    metrics_schema="basic",
    out_dir="runs/finetune_pseudo_hard_clean",
)

if __name__ == "__main__":
    run(CONFIG)
