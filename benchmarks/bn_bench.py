"""Pallas-reduction BatchNorm (models/norm.py TpuBatchNorm) vs the flax
nn.BatchNorm lane, on-chip, full train step at the shapes where the BN
statistic/gradient reduces dominate (docs/step_trace.json: ~53 ms of
the 129 ms 512^2 step).

Timing discipline: serially-chained fori_loop, one scalar readback that
depends on every output leaf (CLAUDE.md).

    python -m benchmarks.bn_bench

Writes docs/bn_bench.json.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from cartseg_tpu.losses import bce_dice_loss
from cartseg_tpu.models import build_model, init_model, param_groups
from cartseg_tpu.train.optim import init_adamw, group_id_tree, adamw_update


def _consume(tree):
    return sum(jnp.sum(l.astype(jnp.float32)) * 1e-12
               for l in jax.tree_util.tree_leaves(tree))


def _time(fn, args, k=15):
    @jax.jit
    def run(*a):
        def body(i, c):
            return fn(c, *a)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    for _ in range(2):
        float(run(*args))
    t0 = time.perf_counter()
    s = float(run(*args))
    assert np.isfinite(s)
    return (time.perf_counter() - t0) / k


def bench_shape(encoder, batch, img, k=15):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, img, img, 3)), jnp.float32)
    y = jnp.asarray((rng.random((batch, img, img, 1)) > 0.7), jnp.float32)
    lrs = jnp.asarray([1e-4] * 3, jnp.float32)
    ones3 = jnp.ones((3,), jnp.float32)

    out = {}
    for lane, flag in (("flax", "0"), ("pallas", "force")):
        os.environ["CARTSEG_PALLAS_BN"] = flag
        model = build_model(encoder, dtype=jnp.bfloat16)
        variables = init_model(model, jax.random.key(0), (1, img, img, 3))
        params, stats = variables["params"], variables["batch_stats"]
        opt = init_adamw(params)
        gids = group_id_tree(param_groups(params))

        def fwd_train(c, x, y):
            o, upd = model.apply({"params": params, "batch_stats": stats},
                                 x + c * 1e-30, train=True,
                                 mutable=["batch_stats"])
            return (c + bce_dice_loss(o, y) * 1e-9 + _consume(upd))

        def full(c, x, y):
            def lf(p):
                o, upd = model.apply({"params": p, "batch_stats": stats},
                                     x + c * 1e-30, train=True,
                                     mutable=["batch_stats"])
                return bce_dice_loss(o, y), upd["batch_stats"]
            (loss, upd), grads = jax.value_and_grad(lf, has_aux=True)(params)
            new_p, new_o = adamw_update(params, grads, opt, gids, lrs,
                                        ones3, 1e-4)
            return (c + loss * 1e-9 + _consume(new_p) + _consume(new_o.mu)
                    + _consume(upd))

        out[lane] = {
            "fwd_train_ms": round(_time(fwd_train, (x, y), k=k) * 1e3, 2),
            "train_step_ms": round(_time(full, (x, y), k=k) * 1e3, 2),
        }
    os.environ.pop("CARTSEG_PALLAS_BN", None)
    for key in ("fwd_train_ms", "train_step_ms"):
        out[f"pallas_speedup_{key}"] = round(
            out["flax"][key] / out["pallas"][key], 3)
    return out


def main():
    assert jax.default_backend() == "tpu"
    report = {}
    for name, (enc, bs, img) in {
        "resnet34_bs32_512": ("resnet34", 32, 512),
        "resnet34_bs128_224": ("resnet34", 128, 224),
        "effnetb0_bs32_512": ("efficientnet-b0", 32, 512),
    }.items():
        report[name] = bench_shape(enc, bs, img)
        print(name, json.dumps(report[name]), flush=True)
    out = Path(__file__).resolve().parent.parent / "docs"
    (out / "bn_bench.json").write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
