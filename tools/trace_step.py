"""HLO-level attribution of the headline train step from a REAL device
trace (jax.profiler works through the relayed runtime — verified; the
'XLA Ops' thread carries per-fusion durations in us).

Captures ~K steps of the bench.py step (resnet34-UNet, bs128@224^2,
augment+fwd/bwd+AdamW), aggregates device op time by fusion name, and
writes the top table to docs/step_trace.json.

    python tools/trace_step.py [--img 224] [--batch 128]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import re
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_step(img, batch):
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

    @jax.jit
    def step(params, stats, opt, images_u8, masks, key):
        imgs, m = augment_batch(key, images_u8, masks, aug)

        def loss_fn(p):
            out, upd = model.apply({"params": p, "batch_stats": stats},
                                   imgs, train=True,
                                   mutable=["batch_stats"])
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


def classify(name: str) -> str:
    n = name.lower()
    if "convolution" in n:
        return "conv fusions"
    if any(t in n for t in ("gather", "dynamic-slice", "scatter")):
        return "gather/slice (warp)"
    if any(t in n for t in ("rng", "threefry", "bitcast-convert")):
        return "rng (noise/params)"
    if "transpose" in n or "copy" in n:
        return "relayout/copy"
    if "reduce" in n or "all-reduce" in n:
        return "reductions"
    if "fusion" in n:
        return "elementwise fusions"
    return "other"


def aggregate_trace(tracedir: str, steps: int, hlo: str) -> dict:
    """Parse the newest trace in `tracedir`: per-op device time from the
    'XLA Ops' thread, aggregated per step, hot fusions mapped back to
    their HLO bodies."""
    tr = sorted(glob.glob(tracedir + "/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(tr[-1]) as f:
        d = json.load(f)
    ev = d["traceEvents"]
    # device pid: the TPU process; 'XLA Ops' thread carries fusions
    dev_pid = next(e["pid"] for e in ev
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "TPU" in e["args"].get("name", ""))
    op_tids = {e["tid"] for e in ev
               if e.get("ph") == "M" and e.get("pid") == dev_pid
               and e.get("name") == "thread_name"
               and "XLA Ops" in e["args"].get("name", "")}
    agg = defaultdict(float)
    cat = defaultdict(float)
    raw = defaultdict(float)  # unstripped op name -> total us
    total = 0.0
    for e in ev:
        if (e.get("ph") == "X" and e.get("pid") == dev_pid
                and e.get("tid") in op_tids):
            base = re.sub(r"\.\d+$", "", e["name"])
            agg[base] += e["dur"]
            raw[e["name"]] += e["dur"]
            cat[classify(base)] += e["dur"]
            total += e["dur"]

    def describe(op):
        m = re.search(rf"%?{re.escape(op)} = .*", hlo)
        if not m:
            return ""
        line = m.group(0)
        shape = re.match(r"%?[\w.\-]+ = (\S+)", line)
        shape = (shape.group(1).split("{")[0] if shape else "?")
        # for fusions, pull the computation it calls and list its ops
        cm = re.search(r"calls=([%\w.\-]+)", line)
        if cm:
            comp = cm.group(1).lstrip("%")
            body = re.search(
                rf"%?{re.escape(comp)} [^\n]*\{{(.*?)\n\}}", hlo, re.S)
            if body:
                ops = []
                for ln in body.group(1).splitlines():
                    m2 = re.search(r" = \S+ ([a-z][a-z0-9\-]*)\(", ln)
                    if m2:
                        ops.append(m2.group(1))
                from collections import Counter
                common = Counter(o for o in ops
                                 if o not in ("parameter", "constant"))
                return shape + " | " + " ".join(
                    f"{k}x{v}" for k, v in common.most_common(6))
        return line.split(" = ")[1][:110]
    top_individual = sorted(raw.items(), key=lambda kv: -kv[1])[:20]
    hot = [{"op": op, "ms_per_step": round(us / steps / 1e3, 3),
            "hlo": describe(op)} for op, us in top_individual]
    per_step = {k: round(v / steps / 1e3, 3)
                for k, v in sorted(agg.items(), key=lambda kv: -kv[1])}
    return {
        "steps_traced": steps,
        "device_busy_ms_per_step": round(total / steps / 1e3, 3),
        "category_ms_per_step": {k: round(v / steps / 1e3, 3)
                                 for k, v in sorted(cat.items(),
                                                    key=lambda kv: -kv[1])},
        "top_ops_ms_per_step": dict(list(per_step.items())[:25]),
        # untruncated per-base-op attribution (sums to device busy);
        # roofline.py records this as agg_by_op_ms
        "all_ops_ms_per_step": per_step,
        "hot_fusions": hot,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=8)
    ns = ap.parse_args(argv)
    assert jax.default_backend() == "tpu"

    step, state = build_step(ns.img, ns.batch)
    params, stats, opt, images, masks = state
    key = jax.random.key(1)
    for i in range(3):  # warmup/compile
        key, k = jax.random.split(key)
        params, stats, opt, loss = step(params, stats, opt, images,
                                        masks, k)
    float(loss)

    tracedir = "/tmp/step_trace"
    jax.profiler.start_trace(tracedir)
    for i in range(ns.steps):
        key, k = jax.random.split(key)
        params, stats, opt, loss = step(params, stats, opt, images,
                                        masks, k)
    float(loss)
    jax.profiler.stop_trace()

    hlo = step.lower(params, stats, opt, images, masks,
                     jax.random.key(0)).compile().as_text()
    report = aggregate_trace(tracedir, ns.steps, hlo)
    report["shape"] = f"resnet34-UNet bs{ns.batch}@{ns.img}^2 bf16 full step"
    print(json.dumps(report, indent=1))
    (REPO / "docs" / "step_trace.json").write_text(
        json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
