"""Attribute the augment pipeline's on-chip cost op-by-op and sweep
the full-step batch size (ROADMAP #3 follow-up to step_profile.py).

Each augment op is ablated from AugmentConfig.train_512 one at a time;
the delta vs the full pipeline is that op's marginal cost inside the
fused program. Timing: serially-chained fori_loop, one scalar readback
(CLAUDE.md discipline).

    python -m benchmarks.augment_bench [--sweep]

Writes docs/augment_bench.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from cartseg_tpu.data import AugmentConfig, augment_batch

IMG, BATCH = 224, 128
K = 30


def _time(fn, args, k=K):
    @jax.jit
    def run(*a):
        def body(i, c):
            return fn(jax.random.fold_in(jax.random.key(0), i), c, *a)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    for _ in range(2):
        float(run(*args))
    t0 = time.perf_counter()
    s = float(run(*args))
    assert np.isfinite(s)
    return (time.perf_counter() - t0) / k


def time_aug(cfg, images, masks, k=K):
    def f(key, c, images, masks):
        imgs, m = augment_batch(key, images, masks, cfg)
        # consume every output so nothing is DCE'd
        return (c + jnp.sum(imgs.astype(jnp.float32)) * 1e-12
                + jnp.sum(m) * 1e-12)
    return _time(f, (images, masks), k=k)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", action="store_true",
                    help="also sweep full-step batch size")
    ns = ap.parse_args(argv)
    assert jax.default_backend() == "tpu"

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (BATCH, IMG, IMG, 3),
                                      np.uint8))
    masks = jnp.asarray((rng.random((BATCH, IMG, IMG, 1)) > 0.7),
                        jnp.float32)

    base = AugmentConfig.train_512()
    full_ms = time_aug(base, images, masks) * 1e3
    ablations = {
        "noise": dict(noise_p=0.0),
        "hsv": dict(hsv_p=0.0),
        "warp(rot+zoom)": dict(rotate_p=0.0, scale_p=0.0),
        "hflip": dict(hflip_p=0.0),
        "motion_blur": dict(motion_blur_p=0.0),
        "brightness_contrast": dict(brightness_contrast_p=0.0),
    }
    report = {"shape": f"bs{BATCH}@{IMG}^2", "full_ms": round(full_ms, 3),
              "marginal_ms": {}}
    for name, kw in ablations.items():
        ms = time_aug(dataclasses.replace(base, **kw), images, masks) * 1e3
        report["marginal_ms"][name] = round(full_ms - ms, 3)
    none_ms = time_aug(AugmentConfig.none(), images, masks) * 1e3
    report["normalize_only_ms"] = round(none_ms, 3)

    if ns.sweep:
        from cartseg_tpu.losses import bce_dice_loss
        from cartseg_tpu.models import build_model, init_model, param_groups
        from cartseg_tpu.train.optim import (init_adamw, group_id_tree,
                                             adamw_update)

        model = build_model("resnet34", dtype=jnp.bfloat16)
        variables = init_model(model, jax.random.key(0), (1, IMG, IMG, 3))
        params, stats = variables["params"], variables["batch_stats"]
        opt = init_adamw(params)
        gids = group_id_tree(param_groups(params))
        lrs = jnp.asarray([1e-4] * 3, jnp.float32)
        ones3 = jnp.ones((3,), jnp.float32)

        def consume(tree):
            return sum(jnp.sum(l.astype(jnp.float32)) * 1e-12
                       for l in jax.tree_util.tree_leaves(tree))

        report["full_step_sweep"] = {}
        for bs in (64, 96, 128, 192, 256):
            imgs_b = jnp.asarray(rng.integers(0, 255, (bs, IMG, IMG, 3),
                                              np.uint8))
            masks_b = jnp.asarray((rng.random((bs, IMG, IMG, 1)) > 0.7),
                                  jnp.float32)

            def full(key, c, images, masks):
                im, m = augment_batch(key, images, masks, base)

                def loss_fn(p):
                    out, upd = model.apply(
                        {"params": p, "batch_stats": stats}, im,
                        train=True, mutable=["batch_stats"])
                    return bce_dice_loss(out, m), upd["batch_stats"]
                (loss, upd), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                new_p, new_o = adamw_update(params, grads, opt, gids,
                                            lrs, ones3, 1e-4)
                return (c + loss * 1e-9 + consume(new_p)
                        + consume(new_o.mu) + consume(upd))
            ms = _time(full, (imgs_b, masks_b), k=15) * 1e3
            report["full_step_sweep"][f"bs{bs}"] = {
                "ms": round(ms, 2), "img_per_s": round(bs / ms * 1e3, 1)}

    print(json.dumps(report, indent=1))
    out = Path(__file__).resolve().parent.parent / "docs"
    (out / "augment_bench.json").write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
