"""ABL training, 'unlettered' variant — reference
src/training/abl_training/train_BCEDice_ABL.py: plain square letterbox
WITHOUT side padding (:83-96) on the unlettered mask tree; otherwise
identical to train_bce_dice_abl."""

from cartseg_tpu.workloads.train_bce_dice_abl import CONFIG as _BASE
from cartseg_tpu.workloads._runner import run

CONFIG = _BASE.with_overrides(
    side_padding_ratio=0.0,
    out_dir="runs/train_bce_dice_abl_unlettered",
)

if __name__ == "__main__":
    run(CONFIG)
