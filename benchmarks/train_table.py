"""Regenerate docs/BENCHMARKS.md's training table: full train step
(on-device augment + bf16 fwd/bwd + per-group AdamW + BN updates) at
each published workload shape. Timing: serially-chained fori_loop, one
scalar readback depending on every output leaf (CLAUDE.md discipline).

    python -m benchmarks.train_table

Writes docs/train_table.json.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from cartseg_tpu.data import AugmentConfig, augment_batch
from cartseg_tpu.losses import bce_dice_loss, bce_dice_abl
from cartseg_tpu.losses.boundary import composite_seg_loss
from cartseg_tpu.models import build_model, init_model, param_groups
from cartseg_tpu.train.optim import init_adamw, group_id_tree, adamw_update


def _consume(tree):
    return sum(jnp.sum(l.astype(jnp.float32)) * 1e-12
               for l in jax.tree_util.tree_leaves(tree))


def _time(fn, args, k=15):
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


def loss_of(name):
    if name == "bce_dice":
        return lambda out, m: bce_dice_loss(out, m)
    if name == "abl":
        return lambda out, m: bce_dice_abl(out, m)[0]
    if name == "boundary":
        def f(out, m):
            r = composite_seg_loss(out, m)
            return r[0] if isinstance(r, tuple) else r
        return f
    raise ValueError(name)


def bench_row(encoder, batch, img, loss_name, k=15):
    rng = np.random.default_rng(0)
    model = build_model(encoder, dtype=jnp.bfloat16)
    variables = init_model(model, jax.random.key(0), (1, img, img, 3))
    params, stats = variables["params"], variables["batch_stats"]
    opt = init_adamw(params)
    gids = group_id_tree(param_groups(params))
    aug = AugmentConfig.train_512()
    lf0 = loss_of(loss_name)
    lrs = jnp.asarray([1e-4] * 3, jnp.float32)
    ones3 = jnp.ones((3,), jnp.float32)

    images = jnp.asarray(rng.integers(0, 255, (batch, img, img, 3),
                                      np.uint8))
    masks = jnp.asarray((rng.random((batch, img, img, 1)) > 0.7),
                        jnp.float32)

    def full(key, c, images, masks):
        im, m = augment_batch(key, images, masks, aug)

        def lf(p):
            out, upd = model.apply({"params": p, "batch_stats": stats},
                                   im + c * 1e-30, train=True,
                                   mutable=["batch_stats"])
            return lf0(out, m), upd["batch_stats"]
        (loss, upd), grads = jax.value_and_grad(lf, has_aux=True)(params)
        new_p, new_o = adamw_update(params, grads, opt, gids, lrs, ones3,
                                    1e-4)
        return (c + loss * 1e-9 + _consume(new_p) + _consume(new_o.mu)
                + _consume(upd))

    ms = _time(full, (images, masks), k=k) * 1e3
    return {"ms": round(ms, 1), "img_per_s": round(batch / ms * 1e3, 1)}


ROWS = [
    ("headline bce_dice resnet34", "resnet34", 128, 224, "bce_dice"),
    ("bce_dice resnet34", "resnet34", 32, 224, "bce_dice"),
    ("bce_dice effnet-b0", "efficientnet-b0", 128, 224, "bce_dice"),
    ("bce_dice resnet34", "resnet34", 32, 512, "bce_dice"),
    ("bce_dice resnet34", "resnet34", 128, 512, "bce_dice"),
    ("bce_dice+ABL effnet-b0", "efficientnet-b0", 6, 512, "abl"),
    ("bce_dice+SDF-boundary effnet-b0", "efficientnet-b0", 6, 512,
     "boundary"),
]

# batch sweep for the EDT-loss families at the reference's primary
# 512^2 resolution (VERDICT r3 next-round #3: bs6 is the reference's
# VRAM-bound parity batch, train_bce_dice.py:31-34 — it undersells the
# chip; these rows document the throughput-mode configs)
ROWS_EDT_SWEEP = [
    (f"bce_dice+{fam} effnet-b0", "efficientnet-b0", bs, 512, loss)
    for fam, loss in (("ABL", "abl"), ("SDF-boundary", "boundary"))
    for bs in (24, 48, 96)
]


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default="main",
                    choices=["main", "edt_sweep"],
                    help="main = the published table; edt_sweep = "
                         "ABL/SDF batch sweep at 512^2")
    ns = ap.parse_args(argv)
    assert jax.default_backend() == "tpu"
    rows = ROWS if ns.rows == "main" else ROWS_EDT_SWEEP
    report = {}
    for label, enc, bs, img, ln in rows:
        key = f"{label} bs{bs}@{img}"
        report[key] = bench_row(enc, bs, img, ln)
        print(key, json.dumps(report[key]), flush=True)
    out = Path(__file__).resolve().parent.parent / "docs"
    name = ("train_table.json" if ns.rows == "main"
            else "edt_batch_sweep.json")
    path = out / name
    if ns.rows == "edt_sweep" and path.exists():
        try:
            prev = json.loads(path.read_text())
            prev.update(report)
            report = prev
        except Exception:
            pass
    path.write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
