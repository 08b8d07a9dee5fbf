"""Fine-tune with BCE+Dice+ABL on clean+hard from an ABL pseudo
checkpoint — reference src/training/finetune_BCEDice_ABL.py (and its
byte-identical abl_training twin): 30 epochs, abl_weight 0.1, guarded
ABL import (:38-43) — here ABL is always available on device."""

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
    seed=1337,
    loss=LossSpec("bce_dice_abl", {"bce_weight": 0.5, "abl_weight": 0.1}),
    augment="train_512",
    sources=[
        SourceSpec("hard", "data/hard/images", "data/hard/masks",
                   ratio=1.0, loss_weight=1.0),
        SourceSpec("clean", "data/clean/images", "data/clean/masks",
                   ratio=1.0, loss_weight=1.0),
    ],
    val_source="hard",
    val_frac=0.12,
    metrics_schema="abl",
    out_dir="runs/finetune_bce_dice_abl",
)

if __name__ == "__main__":
    run(CONFIG)
