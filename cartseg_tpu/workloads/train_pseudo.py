"""Pseudo-label training — reference src/train_pseudo.py: multiple image
roots + one merged mask root, session-aware split via the
store_*/session_* heuristic (:130-153), seeds fixed at 1337 (:58-64),
efficientnet-b0, ImageNet norm."""

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
    loss=LossSpec("bce_dice", {"bce_weight": 0.5, "smooth": 1.0}),
    augment="train_512",
    split="session_seeded",
    image_roots=[],   # set via --image_roots a,b,c
    metrics_schema="basic",
    out_dir="runs/train_pseudo",
)

if __name__ == "__main__":
    run(CONFIG)
