"""Pseudo-label generator CLI — the TPU replacement for both
create_pseudo_labels.py (single-image loop) and
create_pseudo_labels_gpu.py (batched): batched ensemble + flip-TTA +
QC run in one jitted program per batch.

Usage:
  python -m cartseg_tpu.workloads.create_pseudo_labels \
      --images_root DIR --out_dir DIR \
      --checkpoints ckptA,ckptB --weights 0.5,0.5 [--encoder ...]
Checkpoints may be flax ckpt dirs or reference .pth files (mixed).
"""

from __future__ import annotations

import argparse
from pathlib import Path

from cartseg_tpu.infer import PseudoLabelConfig, generate_pseudo_labels
from cartseg_tpu.infer.engine import load_member, load_torch_member


def _load_members(paths, weights, encoder):
    members = []
    for p, w in zip(paths, weights):
        p = Path(p)
        if p.suffix == ".pth":
            members.append(load_torch_member(p, encoder, w))
        else:
            members.append(load_member(p, encoder, w))
    return members


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--images_root", required=True)
    ap.add_argument("--out_dir", default="pseudo_masks")
    ap.add_argument("--overlay_dir", default=None)
    ap.add_argument("--checkpoints", required=True,
                    help="comma-separated ckpt dirs or .pth files")
    ap.add_argument("--weights", default=None,
                    help="comma-separated ensemble weights (default 0.5,0.25,0.25 style normalized equal)")
    ap.add_argument("--encoder", default="efficientnet-b0")
    ap.add_argument("--img_size", type=int, default=512)
    ap.add_argument("--threshold", type=float, default=None)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--max_masks", type=int, default=100_000)
    ap.add_argument("--max_per_bucket", type=int, default=50)
    ap.add_argument("--no_probs", action="store_true")
    ap.add_argument("--no_overlays", action="store_true")
    args = ap.parse_args(argv)

    ckpts = args.checkpoints.split(",")
    weights = ([float(w) for w in args.weights.split(",")]
               if args.weights else [1.0] * len(ckpts))
    members = _load_members(ckpts, weights, args.encoder)
    cfg = PseudoLabelConfig(
        images_root=args.images_root, out_dir=args.out_dir,
        overlay_dir=args.overlay_dir, img_size=args.img_size,
        threshold=args.threshold, batch_size=args.batch_size,
        max_masks=args.max_masks, max_per_bucket=args.max_per_bucket,
        save_probs=not args.no_probs,
        save_overlays=not args.no_overlays and args.overlay_dir is not None)
    out = generate_pseudo_labels(members, cfg)
    print(out)


if __name__ == "__main__":
    main()
