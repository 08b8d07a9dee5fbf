"""Remat A/B at the headline shape — attacking the PROVEN byte wall.

docs/roofline.json pins the 224^2 bs128 step at ~97% of the HBM-traffic
bound (36.77 GB/step); the only way past it is to move fewer bytes.
Rematerialization trades stored activations (written fwd + read bwd)
for recompute FLOPs — and the step is only at 42% MXU, so there are
spare FLOPs. Whether the trade WINS is an empirical question this
benchmark answers with on-chip numbers (VERDICT r3 next-round #2: the
roadmap asserted "remat adds recompute traffic" without a number).

Lanes:
  * none       — the current default step
  * full       — jax.checkpoint over the whole forward (cfg.remat=True):
                 saves only the inputs; backward re-runs the entire net
  * stages     — jax.checkpoint with save_only_these_names over the
                 encoder stage outputs + decoder output (the tags in
                 models/unet.py): backward recomputes only within each
                 stage, reading stage boundaries from HBM
  * f8stash    — forward unchanged; conv backward residuals for inputs
                 with min(H,W) >= 56 stored in fp8-e4m3 instead of bf16
                 (models/stash.py, VERDICT r4 #7): half the residual
                 bytes on the high-res stages, NO recompute. dx exact,
                 dw sees the quantized activation (tests/test_stash.py)
  * f8stash_all — same with every conv stashed (min_hw=1)

    python -m benchmarks.remat_bench [--img 224] [--batch 128]

Writes docs/remat_bench.json.
"""

from __future__ import annotations

import argparse
import functools
import json
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def build_step(img, batch, remat_lane: str):
    import jax
    import jax.numpy as jnp

    from cartseg_tpu.data import AugmentConfig, augment_batch
    from cartseg_tpu.losses import bce_dice_loss
    from cartseg_tpu.models import build_model, init_model, param_groups
    from cartseg_tpu.train.optim import (init_adamw, group_id_tree,
                                         adamw_update)

    model = build_model("resnet34", dtype=jnp.bfloat16)
    variables = init_model(model, jax.random.key(0), (1, img, img, 3))
    params, stats = variables["params"], variables["batch_stats"]
    opt = init_adamw(params)
    gids = group_id_tree(param_groups(params))
    aug = AugmentConfig.train_512()
    lrs = jnp.asarray([1e-4] * 3, jnp.float32)
    ones3 = jnp.ones((3,), jnp.float32)

    def forward(p, bs, imgs):
        return model.apply({"params": p, "batch_stats": bs},
                           imgs, train=True, mutable=["batch_stats"])

    if remat_lane == "full":
        forward = jax.checkpoint(forward)
    elif remat_lane == "stages":
        names = [f"enc_stage{i}" for i in range(5)] + ["decoder_out"]
        forward = jax.checkpoint(
            forward,
            policy=jax.checkpoint_policies.save_only_these_names(*names))
    elif remat_lane not in ("none", "f8stash", "f8stash_all"):
        raise ValueError(remat_lane)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, stats, opt, images_u8, masks, key):
        imgs, m = augment_batch(key, images_u8, masks, aug)

        def loss_fn(p):
            out, upd = forward(p, stats, imgs)
            return bce_dice_loss(out, m), upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        new_p, new_o = adamw_update(params, grads, opt, gids, lrs, ones3,
                                    1e-4)
        return new_p, new_stats, new_o, loss

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (batch, img, img, 3),
                                      np.uint8))
    masks = jnp.asarray((rng.random((batch, img, img, 1)) > 0.7),
                        jnp.float32)
    return step, (params, stats, opt, images, masks)


def measure(img, batch, lane, warmup=10, steps=30):
    import jax
    import os

    # CARTSEG_F8_STASH is read at TRACE time (models/stash.py) — set it
    # for this lane's build+compile+measure, restore after
    if lane == "f8stash":
        os.environ["CARTSEG_F8_STASH"] = "56"
    elif lane == "f8stash_all":
        os.environ["CARTSEG_F8_STASH"] = "1"
    try:
        return _measure(img, batch, lane, warmup, steps)
    finally:
        os.environ.pop("CARTSEG_F8_STASH", None)


def _measure(img, batch, lane, warmup=10, steps=30):
    import jax

    step, (params, stats, opt, images, masks) = build_step(img, batch,
                                                           lane)
    key = jax.random.key(1)
    for _ in range(warmup):
        key, k = jax.random.split(key)
        params, stats, opt, loss = step(params, stats, opt, images,
                                        masks, k)
    float(loss)  # readback sync; block_until_ready is a no-op here

    t0 = time.time()
    for _ in range(steps):
        key, k = jax.random.split(key)
        params, stats, opt, loss = step(params, stats, opt, images,
                                        masks, k)
    float(loss)
    dt = time.time() - t0

    compiled = step.lower(params, stats, opt, images, masks,
                          jax.random.key(0)).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else (cost or {})
    return {
        "lane": lane,
        "ms_per_step": round(dt / steps * 1e3, 2),
        "images_per_sec": round(batch * steps / dt, 1),
        "hlo_bytes_GB": round(float(cost.get("bytes accessed", 0.0))
                              / 1e9, 3),
        "hlo_flops_G": round(float(cost.get("flops", 0.0)) / 1e9, 1),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--lanes", default="none,stages,full")
    ap.add_argument("--steps", type=int, default=30)
    ns = ap.parse_args(argv)

    rows = []
    for lane in ns.lanes.split(","):
        r = measure(ns.img, ns.batch, lane, steps=ns.steps)
        print(json.dumps(r))
        rows.append(r)
    out = {"shape": f"resnet34-UNet bs{ns.batch}@{ns.img}^2 bf16 "
                    "full step (augment+fwd/bwd+AdamW+BN)",
           "rows": rows}
    path = REPO / "docs" / "remat_bench.json"
    # keep results for other shapes from earlier runs
    if path.exists():
        try:
            prev = json.loads(path.read_text())
            runs = prev.get("runs", [prev] if "rows" in prev else [])
        except Exception:
            runs = []
    else:
        runs = []
    runs = [r for r in runs if r.get("shape") != out["shape"]] + [out]
    path.write_text(json.dumps({"runs": runs}, indent=1))


if __name__ == "__main__":
    main()
