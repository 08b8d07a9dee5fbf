"""Per-sample vs batch-shared warp cost INSIDE the full train step
(VERDICT r1 item 8): the 56 ms figure from round 1 was the isolated
warp; here we measure the end-to-end step at the finetune_for_224
shape (bs 20/32 @ 224²) and at the 512² baseline shape, both augment
modes, on the real chip. If per-sample costs <~10% of the step, it
becomes the default (truer albumentations joint distribution).

    python -m benchmarks.warp_bench

Timing: K-step serially-dependent loop, one scalar readback
(block_until_ready is a no-op on this relayed runtime — CLAUDE.md).
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from cartseg_tpu.data import AugmentConfig, augment_batch
from cartseg_tpu.losses import bce_dice_loss
from cartseg_tpu.models import build_model, init_model, param_groups
from cartseg_tpu.train.optim import init_adamw, group_id_tree, adamw_update


def make_step(model, aug):
    def train_step(params, stats, opt, gids, images_u8, masks, key, lrs):
        imgs, m = augment_batch(key, images_u8, masks, aug)

        def loss_fn(p):
            out, upd = model.apply({"params": p, "batch_stats": stats},
                                   imgs, train=True,
                                   mutable=["batch_stats"])
            return bce_dice_loss(out, m), upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        new_params, new_opt = adamw_update(
            params, grads, opt, gids, lrs, jnp.ones((3,)), 1e-4)
        return new_params, new_stats, new_opt, loss

    return train_step


def time_step(encoder, B, hw, per_sample, aug_name="train_512", k=20):
    rng = np.random.default_rng(0)
    model = build_model(encoder, dtype=jnp.bfloat16)
    variables = init_model(model, jax.random.key(0), (1, hw, hw, 3))
    params, stats = variables["params"], variables["batch_stats"]
    opt = init_adamw(params)
    gids = group_id_tree(param_groups(params))
    base = (AugmentConfig.train_512() if aug_name == "train_512"
            else AugmentConfig.train_224())
    aug = dataclasses.replace(base, per_sample_warp=per_sample)
    step = make_step(model, aug)

    imgs = jnp.asarray(rng.integers(0, 255, (B, hw, hw, 3), np.uint8))
    masks = jnp.asarray((rng.random((B, hw, hw, 1)) > 0.5), jnp.float32)
    lrs = jnp.asarray([1e-4] * 3, jnp.float32)

    @jax.jit
    def run(params, stats, opt, imgs, masks, lrs):
        def body(i, carry):
            p, s, o, acc = carry
            key = jax.random.fold_in(jax.random.key(0), i)
            p, s, o, loss = step(p, s, o, gids, imgs, masks, key, lrs)
            return p, s, o, acc + loss
        p, s, o, acc = jax.lax.fori_loop(
            0, k, body, (params, stats, opt, jnp.float32(0)))
        return acc

    for _ in range(2):
        float(run(params, stats, opt, imgs, masks, lrs))
    t0 = time.perf_counter()
    acc = float(run(params, stats, opt, imgs, masks, lrs))
    dt = (time.perf_counter() - t0) / k
    assert np.isfinite(acc)
    return dt


def main():
    assert jax.default_backend() == "tpu", "run on the real chip"
    rows = []
    for enc, B, hw, aug in (("efficientnet-b0", 20, 224, "train_224"),
                            ("resnet34", 32, 224, "train_512"),
                            ("resnet34", 6, 512, "train_512")):
        t_shared = time_step(enc, B, hw, False, aug)
        t_per = time_step(enc, B, hw, True, aug)
        rows.append(dict(encoder=enc, batch=B, img=hw, aug=aug,
                         shared_ms=round(t_shared * 1e3, 2),
                         per_sample_ms=round(t_per * 1e3, 2),
                         overhead_pct=round(
                             100 * (t_per - t_shared) / t_shared, 1)))
        print(json.dumps(rows[-1]), flush=True)
    out = Path(__file__).resolve().parent.parent / "docs" / "warp_bench.json"
    out.write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
