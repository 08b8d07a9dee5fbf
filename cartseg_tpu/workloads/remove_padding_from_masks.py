"""Inverse-letterbox CLI — reference remove_padding_from_masks.py.

  python -m cartseg_tpu.workloads.remove_padding_from_masks \
      --masks_root DIR --images_root DIR --out_root DIR [--overlays DIR]
"""

from __future__ import annotations

import argparse

from cartseg_tpu.postprocess import unpad_tree


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--masks_root", required=True)
    ap.add_argument("--images_root", required=True)
    ap.add_argument("--out_root", required=True)
    ap.add_argument("--overlays", default=None)
    ap.add_argument("--side_padding_ratio", type=float, default=0.1)
    args = ap.parse_args(argv)
    unpad_tree(args.masks_root, args.images_root, args.out_root,
               args.side_padding_ratio, args.overlays)


if __name__ == "__main__":
    main()
