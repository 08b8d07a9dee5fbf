"""SAM ViT-B TRAIN-mode A/B: flash vs XLA global attention at the
model level — the measurement that decides `SamConfig.global_attn_flash`
(VERDICT r3 next-round #4: the kernel-level f+b win was 1.21x, but no
model-level train-mode number existed to justify a default).

A fine-tune-shaped step at the official 1024^2 geometry: encoder
forward + backward over all 93.7M params (the mask-decoder term is
<4 ms and identical in both lanes — the global-attention blocks are
the entire difference). Params stay jit ARGUMENTS (closing over them
bakes 375 MB of literals into the HLO; the remote-compile transport
rejects it — docs/BENCHMARKS.md SAM trap #1) and steady state discards
>=2 warm groups (trap #2).

    python -m benchmarks.sam_train_bench

Writes docs/sam_train_bench.json.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from cartseg_tpu.models.sam import Sam, SamConfig


def _steady_ms(call, k_per_group: int = 4, groups: int = 5, warm: int = 2):
    per = []
    for _ in range(groups):
        t0 = time.time()
        acc = 0.0
        for _ in range(k_per_group):
            acc = acc + call()
        float(acc)  # readback sync; block_until_ready is a no-op here
        per.append((time.time() - t0) / k_per_group * 1e3)
    return float(np.median(per[warm:])), per


def build_lane(cfg, var, x):
    model = Sam(cfg, dtype=jnp.bfloat16)

    @jax.jit
    def step(v, xx):
        def loss_fn(vv):
            feats = model.apply(vv, model.preprocess(xx),
                                method=model.encode_image)
            return jnp.mean(jnp.square(feats.astype(jnp.float32)))

        loss, grads = jax.value_and_grad(loss_fn)(v)
        # consume every grad leaf so XLA cannot dead-code any of the
        # backward (the round-1 ABL measurement artifact)
        gsum = sum(jnp.sum(jnp.abs(g.astype(jnp.float32)))
                   for g in jax.tree_util.tree_leaves(grads))
        return loss + 0.0 * gsum, gsum

    return step


def main():
    cfg = SamConfig()  # full ViT-B
    base = Sam(cfg, dtype=jnp.bfloat16)
    t0 = time.time()
    var = jax.jit(lambda k: base.init(
        k, jnp.zeros((1, cfg.img_size, cfg.img_size, 3)),
        jnp.zeros((1, 2, 2)), jnp.zeros((1, 2), jnp.int32)))(
            jax.random.key(0))
    print(f"init {time.time()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(
        0, 255, (1, cfg.img_size, cfg.img_size, 3), np.uint8)
    ).astype(jnp.float32)

    out = {"model": "SAM ViT-B encoder fine-tune step (fwd+bwd over all "
                    "params) at 1024^2, bf16"}
    results = {}
    for lane, flash in (("xla_fp32_softmax", False), ("flash", True)):
        step = build_lane(dataclasses.replace(cfg, global_attn_flash=flash),
                          var, x)
        t0 = time.time()
        loss, gsum = step(var, x)
        print(f"{lane}: compile+first {time.time()-t0:.1f}s "
              f"loss={float(loss):.5f} gsum={float(gsum):.2f}", flush=True)
        ms, groups = _steady_ms(lambda: step(var, x)[0])
        print(f"{lane}: {ms:.1f} ms/step steady "
              f"(groups: {['%.0f' % g for g in groups]})", flush=True)
        results[lane] = {"ms_per_step": round(ms, 1),
                         "groups_ms": [round(g, 1) for g in groups],
                         "loss": float(loss), "grad_abs_sum": float(gsum)}
    out["lanes"] = results
    out["flash_speedup"] = round(
        results["xla_fp32_softmax"]["ms_per_step"]
        / results["flash"]["ms_per_step"], 3)
    path = Path(__file__).resolve().parent.parent / "docs" \
        / "sam_train_bench.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
