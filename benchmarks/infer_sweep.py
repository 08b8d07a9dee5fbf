"""Batch sweep of the COMPLETE fused pseudo-label program (ensemble +
flip TTA + CC cleanup + all QC) — re-checks the batch-size default
after the round-5 RLE area-stats rewrite shifted the non-model cost
profile (the round-4 sweep that chose bs64 ran the pre-RLE program).

    python -m benchmarks.infer_sweep [--batches 32,64,96,128]

Writes docs/infer_batch_sweep.json. Timing discipline per CLAUDE.md:
device-resident inputs, one dispatch per batch, one readback per
group, >=2 warm groups discarded.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent

IMG = 512
MEMBERS = 3
GROUPS = 5
WARM = 2
STEPS = 8


def measure(batch):
    import jax
    import jax.numpy as jnp

    from cartseg_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD
    from cartseg_tpu.infer.engine import (EnsembleMember,
                                          pseudo_label_program)
    from cartseg_tpu.models import build_model, init_model

    model = build_model("efficientnet-b0", dtype=jnp.bfloat16)
    members = []
    for i in range(MEMBERS):
        v = init_model(model, jax.random.key(i), (1, 64, 64, 3))
        members.append(EnsembleMember(model, v, 1.0))
    program = pseudo_label_program(members, IMAGENET_MEAN, IMAGENET_STD,
                                   int(IMG * IMG * 0.001))

    rng = np.random.default_rng(0)
    base = rng.random((batch, 32, 32, 3)).astype(np.float32)
    up = np.asarray(jax.image.resize(
        jnp.asarray(base), (batch, IMG, IMG, 3), "linear"))
    imgs = jnp.asarray((up * 255).astype(np.uint8))

    per = []
    for _ in range(GROUPS):
        t0 = time.time()
        accs = []
        for _ in range(STEPS):
            pred, probs, stats = program(imgs, 0.5)
            accs.append(stats["fg_area"])
        float(jnp.stack(accs).sum())
        per.append((time.time() - t0) / STEPS * 1e3)
    ms = float(np.median(per[WARM:]))
    return {"batch": batch, "ms_per_batch": round(ms, 1),
            "images_per_sec": round(batch / ms * 1e3, 1),
            "groups_ms": [round(p, 1) for p in per]}


def main(argv=None):
    import jax
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,64,96,128")
    ns = ap.parse_args(argv)
    assert jax.default_backend() == "tpu"
    rows = []
    for b in ns.batches.split(","):
        r = measure(int(b))
        print(json.dumps(r))
        rows.append(r)
    (REPO / "docs" / "infer_batch_sweep.json").write_text(json.dumps(
        {"date": time.strftime("%Y-%m-%d"),
         "shape": f"complete pseudo-label program {MEMBERS}x effnet-b0 "
                  f"+ TTA + CC + QC @{IMG}^2 bf16 (post-RLE)",
         "rows": rows}, indent=1))


if __name__ == "__main__":
    main()
