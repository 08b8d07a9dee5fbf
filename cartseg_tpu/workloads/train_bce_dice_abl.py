"""BCE+Dice + Active Boundary Loss — reference
src/training/train_BCEDice_ABL.py: abl_weight=0.1, boundary-skip-rate
tracking (:271-293), loss components in the JSON history (:384-389).
The ABL runs fully on device (jump-flood EDT + masked-dense direction
targets) instead of per-sample CPU scipy (losses/abl.py:197)."""

from cartseg_tpu.train import TrainConfig, LossSpec
from cartseg_tpu.workloads._runner import run

CONFIG = TrainConfig(
    encoder="efficientnet-b0",
    img_size=(512, 512),
    imagenet_norm=True,
    batch_size=6,
    epochs=40,
    lr=1e-4,
    weight_decay=1e-4,
    patience=8,
    seed=1337,
    loss=LossSpec("bce_dice_abl", {"bce_weight": 0.5, "abl_weight": 0.1}),
    augment="train_512",
    split="session_seeded",
    metrics_schema="abl",
    out_dir="runs/train_bce_dice_abl",
)

if __name__ == "__main__":
    run(CONFIG)
