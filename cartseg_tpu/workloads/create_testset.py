"""Interactive test-set labeling CLI — reference src/create_testset.py:
TPU proposal model + optional SAM point/box prompting, prefetch thread,
brush/box editor; saves masks at ORIGINAL resolution (:391-396).

  python -m cartseg_tpu.workloads.create_testset \
      --images_root DIR --out_dir DIR --checkpoint CKPT \
      [--sam_checkpoint sam_vit_b.pth] [--no_seg_friendly]

Requires a display for the cv2 UI; SAM is optional (brush-only editing
without it).
"""

from __future__ import annotations

import argparse
from pathlib import Path

from cartseg_tpu.tools.annotate import TPUProposer, run_ui, IMG_EXTS


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--images_root", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--encoder", default="efficientnet-b0")
    ap.add_argument("--sam_checkpoint", default=None)
    ap.add_argument("--img_size", type=int, default=1024)
    ap.add_argument("--no_seg_friendly", action="store_true")
    ap.add_argument("--display_scale", type=float, default=1.0)
    args = ap.parse_args(argv)

    paths = sorted(p for p in Path(args.images_root).rglob("*")
                   if p.suffix.lower() in IMG_EXTS)
    proposer = (TPUProposer(Path(args.checkpoint), args.encoder)
                if args.checkpoint else None)
    run_ui(paths, Path(args.out_dir), proposer,
           Path(args.sam_checkpoint) if args.sam_checkpoint else None,
           img_size=args.img_size, save_size=None, save_original_res=True,
           make_easy=not args.no_seg_friendly,
           display_scale=args.display_scale)


if __name__ == "__main__":
    main()
