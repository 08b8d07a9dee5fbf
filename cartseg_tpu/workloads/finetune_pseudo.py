"""224 fine-tune on hard+clean+pseudo with per-dataset scalar loss
weights — reference src/finetune_pseudo.py (header says
"finetune_hard_only"): ConcatDataset with pseudo weight 0.5 multiplied
into the batch loss (:236-239, 289-295), val on real labels only
(:241-244), encoder warmup controller (:107-125), threshold sweep +
JSON (:210-226, 338-348)."""

from cartseg_tpu.train import TrainConfig, LossSpec, SourceSpec
from cartseg_tpu.workloads._runner import run

CONFIG = TrainConfig(
    encoder="efficientnet-b0",
    img_size=(224, 224),
    imagenet_norm=True,
    batch_size=8,
    epochs=25,
    lr=1e-4,
    encoder_lr_scale=0.3,
    weight_decay=1e-4,
    patience=5,
    seed=42,
    loss=LossSpec("bce_dice_per_sample", {"bce_weight": 0.5, "smooth": 1.0}),
    augment="train_224",
    sources=[
        SourceSpec("hard", "data/hard/images", "data/hard/masks",
                   ratio=1.0, loss_weight=1.0),
        SourceSpec("clean", "data/clean/images", "data/clean/masks",
                   ratio=1.0, loss_weight=1.0),
        SourceSpec("pseudo", "data/pseudo/images", "data/pseudo/masks",
                   ratio=1.0, loss_weight=0.5),
    ],
    val_source="hard",
    val_frac=0.12,
    use_curriculum=False,
    freeze_encoder_epochs=2,
    metrics_schema="basic",
    threshold_sweep=(0.05, 0.95, 19),
    out_dir="runs/finetune_pseudo",
)

if __name__ == "__main__":
    run(CONFIG)
