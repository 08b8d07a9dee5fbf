"""Attribute the headline train step's time (VERDICT r1 item 6 /
ROADMAP #1-#4): measure on-chip, at the bench shape (resnet34-UNet,
bs128@224² bf16), each nested slice of the step —

    augment | model fwd | encoder fwd | decoder+head fwd |
    fwd+loss | fwd+bwd | full step (+AdamW +BN)

plus XLA's own FLOP estimate (compiled cost_analysis) -> MXU
utilization. Also the ABL@512² step attribution (loss pieces vs model).

    python -m benchmarks.step_profile [--abl]

Writes docs/step_profile.json and prints a table.
"""

from __future__ import annotations

import argparse
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

IMG, BATCH = 224, 128
K = 20


def _consume(tree):
    """Reduce a pytree to one scalar that depends on EVERY leaf —
    without this, XLA dead-code-eliminates the untouched parts of the
    backward/optimizer (only leaf[0]'s chain survives) and the
    measurement undercounts by ~2x."""
    return sum(jnp.sum(l.astype(jnp.float32)) * 1e-12
               for l in jax.tree_util.tree_leaves(tree))


def _time(fn, args, k=K):
    """Serial-chained loop, one scalar readback (CLAUDE.md timing)."""
    @jax.jit
    def run(*a):
        def body(i, c):
            out = fn(jax.random.fold_in(jax.random.key(0), i), c, *a)
            return out
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    for _ in range(2):
        float(run(*args))
    t0 = time.perf_counter()
    s = float(run(*args))
    assert np.isfinite(s)
    return (time.perf_counter() - t0) / k


def flops_of(jitted, *args):
    try:
        an = jitted.lower(*args).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception:
        return 0.0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--abl", action="store_true")
    args_ns = ap.parse_args(argv)
    assert jax.default_backend() == "tpu"

    rng = np.random.default_rng(0)
    model = build_model("resnet34", dtype=jnp.bfloat16)
    variables = init_model(model, jax.random.key(0), (1, IMG, IMG, 3))
    params, stats = variables["params"], variables["batch_stats"]
    opt = init_adamw(params)
    gids = group_id_tree(param_groups(params))
    aug = AugmentConfig.train_512()

    images = jnp.asarray(rng.integers(0, 255, (BATCH, IMG, IMG, 3),
                                      np.uint8))
    masks = jnp.asarray((rng.random((BATCH, IMG, IMG, 1)) > 0.7),
                        jnp.float32)
    x_f = images.astype(jnp.float32) / 255.0
    lrs = jnp.asarray([1e-4] * 3, jnp.float32)
    ones3 = jnp.ones((3,), jnp.float32)

    rows = {}

    # augment only
    def aug_only(key, c, images, masks):
        imgs, m = augment_batch(key, images, masks, aug)
        return c + jnp.sum(imgs[0, 0, 0]) * 1e-9 + m[0, 0, 0, 0] * 1e-9
    rows["augment"] = _time(aug_only, (images, masks))

    # encoder fwd
    def enc_fwd(key, c, x):
        feats = model.encoder.apply(
            {"params": params["encoder"], "batch_stats": stats["encoder"]},
            x + c * 1e-30, train=False)
        return c + feats[-1].astype(jnp.float32)[0, 0, 0, 0] * 1e-9
    rows["encoder_fwd"] = _time(enc_fwd, (x_f,))

    # full model fwd
    def model_fwd(key, c, x):
        out = model.apply({"params": params, "batch_stats": stats},
                          x + c * 1e-30, train=False)
        return c + out[0, 0, 0, 0] * 1e-9
    rows["model_fwd"] = _time(model_fwd, (x_f,))
    rows["decoder_head_fwd"] = rows["model_fwd"] - rows["encoder_fwd"]

    # fwd + loss + bwd (no optimizer)
    def fwd_bwd(key, c, x, y):
        def loss_fn(p):
            out, _ = model.apply({"params": p, "batch_stats": stats},
                                 x + c * 1e-30, train=True,
                                 mutable=["batch_stats"])
            return bce_dice_loss(out, y)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        return c + loss * 1e-9 + _consume(grads)
    rows["fwd_bwd"] = _time(fwd_bwd, (x_f, masks))

    # full step
    def full(key, c, images, masks):
        imgs, m = augment_batch(key, images, masks, aug)

        def loss_fn(p):
            out, upd = model.apply({"params": p, "batch_stats": stats},
                                   imgs + c * 1e-30, train=True,
                                   mutable=["batch_stats"])
            return bce_dice_loss(out, m), upd["batch_stats"]
        (loss, upd), grads = jax.value_and_grad(loss_fn,
                                                has_aux=True)(params)
        new_p, new_o = adamw_update(params, grads, opt, gids, lrs, ones3,
                                    1e-4)
        return (c + loss * 1e-9 + _consume(new_p) + _consume(new_o.mu)
                + _consume(upd))
    rows["full_step"] = _time(full, (images, masks))

    # FLOPs / utilization of the fwd+bwd core
    jit_fb = jax.jit(lambda x, y: jax.value_and_grad(
        lambda p: bce_dice_loss(model.apply(
            {"params": p, "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"])[0], y))(params)[0])
    fl = flops_of(jit_fb, x_f, masks)
    report = {
        "shape": f"resnet34-UNet bs{BATCH}@{IMG}^2 bf16",
        "ms": {k: round(v * 1e3, 2) for k, v in rows.items()},
        "images_per_sec_full_step": round(BATCH / rows["full_step"], 1),
        "xla_flops_fwd_bwd": fl,
        "tflops_per_sec_fwd_bwd": round(fl / rows["fwd_bwd"] / 1e12, 1),
    }

    if args_ns.abl:
        from cartseg_tpu.losses import bce_dice_abl
        B5, I5 = 6, 512
        m5 = build_model("efficientnet-b0", dtype=jnp.bfloat16)
        v5 = init_model(m5, jax.random.key(0), (1, I5, I5, 3))
        p5, s5 = v5["params"], v5["batch_stats"]
        o5 = init_adamw(p5)
        g5 = group_id_tree(param_groups(p5))
        x5 = jnp.asarray(rng.random((B5, I5, I5, 3)), jnp.float32)
        y5 = jnp.asarray((rng.random((B5, I5, I5, 1)) > 0.7), jnp.float32)

        def abl_loss_only(key, c, x, y):
            # logits-shaped input straight into the loss (no model)
            total, comps = bce_dice_abl(x[..., :1] * 8.0 + c * 1e-30, y)
            return c + total * 1e-9

        def abl_fwd_bwd(key, c, x, y):
            def lf(p):
                out, _ = m5.apply({"params": p, "batch_stats": s5},
                                  x + c * 1e-30, train=True,
                                  mutable=["batch_stats"])
                total, comps = bce_dice_abl(out, y)
                return total
            loss, grads = jax.value_and_grad(lf)(p5)
            return c + loss * 1e-9 + _consume(grads)

        def abl_full(key, c, x, y):
            def lf(p):
                out, upd = m5.apply({"params": p, "batch_stats": s5},
                                    x + c * 1e-30, train=True,
                                    mutable=["batch_stats"])
                total, comps = bce_dice_abl(out, y)
                return total, upd["batch_stats"]
            (loss, _), grads = jax.value_and_grad(lf, has_aux=True)(p5)
            new_p, new_o = adamw_update(p5, grads, o5, g5, lrs, ones3,
                                        1e-4)
            return c + loss * 1e-9 + _consume(new_p) + _consume(new_o.mu)

        def bce_fwd_bwd(key, c, x, y):
            def lf(p):
                out, _ = m5.apply({"params": p, "batch_stats": s5},
                                  x + c * 1e-30, train=True,
                                  mutable=["batch_stats"])
                return bce_dice_loss(out, y)
            loss, grads = jax.value_and_grad(lf)(p5)
            return c + loss * 1e-9 + _consume(grads)

        abl_rows = {
            "abl_loss_fwd_only": _time(abl_loss_only, (x5, y5), k=10),
            "bce_dice_model_fwd_bwd": _time(bce_fwd_bwd, (x5, y5), k=10),
            "abl_model_fwd_bwd": _time(abl_fwd_bwd, (x5, y5), k=10),
            "abl_full_step": _time(abl_full, (x5, y5), k=10),
        }
        report["abl_512"] = {k: round(v * 1e3, 2)
                             for k, v in abl_rows.items()}

    print(json.dumps(report, indent=1))
    out = Path(__file__).resolve().parent.parent / "docs"
    out.mkdir(exist_ok=True)
    (out / "step_profile.json").write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
