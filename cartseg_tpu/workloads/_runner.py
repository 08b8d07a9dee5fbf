"""Shared workload runner: CLI overrides -> Trainer.fit()."""

from __future__ import annotations

import sys
from typing import List, Optional

from cartseg_tpu.train import TrainConfig, Trainer
from cartseg_tpu.train.config import apply_cli_overrides


def run(cfg: TrainConfig, argv: Optional[List[str]] = None):
    cfg = apply_cli_overrides(cfg, sys.argv[1:] if argv is None else argv)
    trainer = Trainer(cfg)
    result = trainer.fit()
    print(f"best_val_dice={result['best_val_dice']:.4f} "
          f"threshold={result['threshold']:.2f} "
          f"images_per_sec={result['images_per_sec']:.1f}")
    return result
