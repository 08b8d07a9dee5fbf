"""Inference throughput — the second BASELINE.json metric (pseudo-label
"slices(images)/sec"): 3-member efficientnet-b0 ensemble + flip TTA +
full QC statistics per batch at 512^2, the create_pseudo_labels_gpu
workload made TPU-resident.

  python -m benchmarks.inference_bench [--batch 32] [--img 512]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--members", type=int, default=3)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from cartseg_tpu.infer.engine import (
        EnsembleMember, ensemble_probs_fn, qc_stats_fn,
    )
    from cartseg_tpu.models import build_model, init_model
    from cartseg_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD

    model = build_model("efficientnet-b0", dtype=jnp.bfloat16)
    members = []
    for i in range(args.members):
        v = init_model(model, jax.random.key(i), (1, 64, 64, 3))
        members.append(EnsembleMember(model, v, 1.0))
    fwd = ensemble_probs_fn(members, IMAGENET_MEAN, IMAGENET_STD,
                            tta_flip=True)
    qc = qc_stats_fn()

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255,
                                    (args.batch, args.img, args.img, 3),
                                    np.uint8))

    def run_once():
        probs, probs_flip = fwd(imgs)
        stats = qc(probs, probs_flip, imgs, 0.5)
        return stats["fg_area"]

    out = run_once()
    _ = float(out.sum())  # readback sync (block_until_ready is a no-op)
    t0 = time.time()
    acc = 0.0
    for _ in range(args.steps):
        acc = acc + run_once().sum()
    _ = float(acc)
    dt = time.time() - t0
    ips = args.batch * args.steps / dt
    print(json.dumps({
        "metric": f"pseudo_label_images_per_sec_{args.img}",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "detail": f"{args.members}-model ensemble + flip TTA + QC",
    }))


if __name__ == "__main__":
    main()
