"""Hard-case mining CLI — reference mine_hard_cases.py, batched on TPU.

  python -m cartseg_tpu.workloads.mine_hard_cases \
      --images_root DIR --out_dir DIR --checkpoints ckpt [--encoder ...]
"""

from __future__ import annotations

import argparse

from cartseg_tpu.infer import MiningConfig, mine_hard_cases
from cartseg_tpu.workloads.create_pseudo_labels import _load_members


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--images_root", required=True)
    ap.add_argument("--out_dir", default="hard_mining")
    ap.add_argument("--checkpoints", required=True)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--encoder", default="efficientnet-b0")
    ap.add_argument("--img_size", type=int, default=512)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--sample_size", type=int, default=5000)
    ap.add_argument("--seed", type=int, default=1337)
    args = ap.parse_args(argv)

    ckpts = args.checkpoints.split(",")
    weights = ([float(w) for w in args.weights.split(",")]
               if args.weights else [1.0] * len(ckpts))
    members = _load_members(ckpts, weights, args.encoder)
    cfg = MiningConfig(
        images_root=args.images_root, out_dir=args.out_dir,
        img_size=args.img_size, threshold=args.threshold,
        batch_size=args.batch_size, sample_size=args.sample_size,
        seed=args.seed)
    mine_hard_cases(members, cfg)


if __name__ == "__main__":
    main()
