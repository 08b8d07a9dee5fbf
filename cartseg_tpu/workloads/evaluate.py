"""Standalone checkpoint evaluation (the reference has no eval-only
entry point; its metrics only exist inside train loops): dice/IoU/
precision/recall/F1 over a dataset at a given or swept threshold.

  python -m cartseg_tpu.workloads.evaluate \
      --images_root DIR --masks_root DIR --checkpoint CKPT \
      [--encoder efficientnet-b0] [--img_size 512] [--sweep]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--images_root", required=True)
    ap.add_argument("--masks_root", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--encoder", default="efficientnet-b0")
    ap.add_argument("--img_size", type=int, default=512)
    ap.add_argument("--imagenet_norm", action="store_true", default=True)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--threshold", type=float, default=None)
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--out_json", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from cartseg_tpu import metrics as M
    from cartseg_tpu.data import (gather_pairs_mirror, SegmentationDataset,
                                  Loader)
    from cartseg_tpu.data.augment import normalize_batch, IMAGENET_MEAN, \
        IMAGENET_STD
    from cartseg_tpu.infer.engine import load_member, load_torch_member

    p = Path(args.checkpoint)
    member = (load_torch_member(p, args.encoder) if p.suffix == ".pth"
              else load_member(p, args.encoder))
    thr = args.threshold if args.threshold is not None else member.threshold
    mean = IMAGENET_MEAN if args.imagenet_norm else (0, 0, 0)
    std = IMAGENET_STD if args.imagenet_norm else (1, 1, 1)

    pairs = gather_pairs_mirror(Path(args.images_root),
                                Path(args.masks_root))
    if not pairs:
        raise SystemExit("no image/mask pairs found")
    ds = SegmentationDataset(pairs, (args.img_size, args.img_size))
    loader = Loader(ds, args.batch_size, drop_last=False)

    model, variables = member.model, member.variables

    @jax.jit
    def eval_step(images_u8, masks):
        x = normalize_batch(images_u8.astype(jnp.float32), mean, std)
        logits = model.apply({"params": variables["params"],
                              "batch_stats": variables["batch_stats"]},
                             x, train=False)
        suite = M.eval_suite(logits, masks, t=thr)
        sweep_d, sweep_i = M.threshold_sweep_stats(
            logits, masks, np.linspace(0.05, 0.95, 19))
        return suite, sweep_d, sweep_i

    suites, sds, sis = [], [], []
    for imgs, masks in loader(np.arange(len(ds))):
        suite, d, i = eval_step(imgs, masks)
        suites.append(suite)
        sds.append(d)
        sis.append(i)

    out = {k: float(np.mean([float(s[k]) for s in suites]))
           for k in suites[0]}
    out["threshold"] = thr
    out["n_images"] = len(ds)
    if args.sweep:
        ts = np.linspace(0.05, 0.95, 19)
        dice_t = np.mean(np.stack([np.asarray(d) for d in sds]), axis=0)
        k = int(np.argmax(dice_t))
        out["best_threshold"] = float(ts[k])
        out["best_threshold_dice"] = float(dice_t[k])
    print(json.dumps(out, indent=2))
    if args.out_json:
        Path(args.out_json).write_text(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
