"""Strict-224 mixed fine-tune — reference src/finetune_for_224.py:
hard(0.50)/clean(0.25)/pseudo(0.25) weighted mixed sampling (:55-58),
per-source loss weights with the pseudo curriculum 0.4 -> 0.6 over 4
epochs (:60-65, 322-324), per-sample BCE+Dice (:208-221), encoder
warmup 2 epochs at encoder LR 3e-5 / head LR 1e-4 (:44-48), val = 12%
of hard (:68), threshold sweep 0.05..0.95 x 19 saved as a sidecar
(:234-248, 385-388).

Set the three data sources via --sources_json (a JSON list of
{name, images_root, masks_root, ratio, loss_weight} dicts) or edit
CONFIG.sources."""

from cartseg_tpu.train import TrainConfig, LossSpec, SourceSpec
from cartseg_tpu.workloads._runner import run

CONFIG = TrainConfig(
    encoder="efficientnet-b0",
    img_size=(224, 224),
    imagenet_norm=True,
    batch_size=20,
    epochs=20,
    lr=1e-4,                 # head LR (:46)
    encoder_lr_scale=0.3,    # encoder LR 3e-5 (:47)
    weight_decay=1e-4,
    patience=5,
    seed=42,
    loss=LossSpec("bce_dice_per_sample", {"bce_weight": 0.5, "smooth": 1.0}),
    augment="train_224",
    sources=[
        SourceSpec("hard", "data/hard/images", "data/hard/masks",
                   ratio=0.50, loss_weight=1.0),
        SourceSpec("clean", "data/clean/images", "data/clean/masks",
                   ratio=0.25, loss_weight=1.0),
        SourceSpec("pseudo", "data/pseudo/images", "data/pseudo/masks",
                   ratio=0.25, loss_weight=0.4),
    ],
    val_source="hard",
    val_frac=0.12,
    use_curriculum=True,
    pseudo_w_start=0.4,
    pseudo_w_end=0.6,
    pseudo_ramp_epochs=4,
    freeze_encoder_epochs=2,          # encoder warmup (:44-45, 264-272)
    unfreeze_encoder_lr_scale=1.0,
    metrics_schema="basic",
    threshold_sweep=(0.05, 0.95, 19),
    out_dir="runs/finetune_for_224",
)

if __name__ == "__main__":
    run(CONFIG)
