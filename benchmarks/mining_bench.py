"""Hard-case mining throughput: fused one-dispatch program vs the
round-4 two-dispatch path (VERDICT r4 weak #7 / next-round #6).

The reference scores candidates one image at a time on the host
(mine_hard_cases.py:138-254 — a bs=1 loop over cv2 + torch forward);
here the whole per-batch computation (3-model ensemble + flip TTA +
entropy/near/var + batched CC component count + hole fraction +
perimeter + composite) is ONE jitted program (infer/mining.py
mining_program). The legacy lane dispatches forward and metrics
separately — each dispatch carries ~19 ms fixed host overhead on this
runtime (CLAUDE.md), and its per-image vmapped CC keeps label
propagation in the XLA while-loop lane instead of the batched Pallas
VMEM fixpoint.

Timing discipline (CLAUDE.md): device-resident inputs, one readback
sync per measured group (block_until_ready is a no-op through the
relay), >=2 warm groups discarded.

    python -m benchmarks.mining_bench [--img 512] [--batches 16,64]

Writes docs/mining_bench.json; the row goes into docs/BENCHMARKS.md.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent

MEMBERS = 3
GROUPS = 5
WARM_GROUPS = 2
STEPS_PER_GROUP = 8


def _members(img_size):
    import jax
    import jax.numpy as jnp

    from cartseg_tpu.infer.engine import EnsembleMember
    from cartseg_tpu.models import build_model, init_model

    model = build_model("efficientnet-b0", dtype=jnp.bfloat16)
    ms = []
    for i in range(MEMBERS):
        v = init_model(model, jax.random.key(i), (1, 64, 64, 3))
        ms.append(EnsembleMember(model, v, 1.0))
    return ms


def _images(batch, img):
    """Smooth blobby content (not uniform noise): CC convergence and
    run counts depend on component structure, same recipe as bench.py."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    base = rng.random((batch, 32, 32, 3)).astype(np.float32)
    up = np.asarray(jax.image.resize(
        jnp.asarray(base), (batch, img, img, 3), "linear"))
    return jnp.asarray((up * 255).astype(np.uint8))


def _steady_ms(call, sync):
    """Median per-call ms over post-warm-up groups; each group is
    STEPS_PER_GROUP calls ending in one scalar readback."""
    per = []
    for _ in range(GROUPS):
        t0 = time.time()
        outs = [call() for _ in range(STEPS_PER_GROUP)]
        sync(outs)
        per.append((time.time() - t0) / STEPS_PER_GROUP * 1e3)
    return float(np.median(per[WARM_GROUPS:])), [round(p, 1) for p in per]


def measure(img, batch):
    import jax
    import jax.numpy as jnp

    from cartseg_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD
    from cartseg_tpu.infer.engine import ensemble_probs_fn
    from cartseg_tpu.infer.mining import (MiningConfig, _metrics_fn,
                                          mining_program)

    cfg = MiningConfig()
    members = _members(img)
    imgs = _images(batch, img)

    fused = mining_program(members, IMAGENET_MEAN, IMAGENET_STD,
                           cfg.threshold, cfg.delta_near)

    def call_fused():
        return fused(imgs)["composite"]

    def sync(outs):
        float(jnp.stack(outs).sum())

    fused_ms, fused_groups = _steady_ms(call_fused, sync)

    # round-4 path: two dispatches (ensemble+TTA fwd, then metrics with
    # per-image vmapped CC/hole stats)
    fwd = ensemble_probs_fn(members, IMAGENET_MEAN, IMAGENET_STD,
                            tta_flip=True)
    metrics = _metrics_fn(cfg.threshold, cfg.delta_near)

    def call_two():
        probs, probs_flip = fwd(imgs)
        return metrics(probs, probs_flip)["composite"]

    two_ms, two_groups = _steady_ms(call_two, sync)

    return {
        "img": img, "batch": batch, "members": MEMBERS,
        "fused_ms_per_batch": round(fused_ms, 1),
        "fused_images_per_sec": round(batch / fused_ms * 1e3, 1),
        "two_dispatch_ms_per_batch": round(two_ms, 1),
        "two_dispatch_images_per_sec": round(batch / two_ms * 1e3, 1),
        "speedup": round(two_ms / fused_ms, 2),
        "fused_groups_ms": fused_groups,
        "two_dispatch_groups_ms": two_groups,
    }


def main(argv=None):
    import jax
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--batches", default="16,64")
    ns = ap.parse_args(argv)
    assert jax.default_backend() == "tpu"

    rows = [measure(ns.img, int(b)) for b in ns.batches.split(",")]
    for r in rows:
        print(json.dumps(r))
    out = {"date": time.strftime("%Y-%m-%d"),
           "shape": f"mining program 3x effnet-b0 + TTA + 7 metrics "
                    f"@{ns.img}^2 bf16",
           "rows": rows}
    (REPO / "docs" / "mining_bench.json").write_text(
        json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
