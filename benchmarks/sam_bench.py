"""SAM ViT-B on-chip latency: image embedding (the annotation tool's
critical path — the reference prefetches it ahead of the UI because it
is "the slow part", /root/reference/src/create_testset.py:163-198) and
per-prompt mask decode.

Measurement discipline (learned the hard way, docs/BENCHMARKS.md "SAM"
section): the relayed runtime has a large per-executable warm-up — the
first ~10 executes of a fresh program can each cost 150-450 ms of
host-side overhead that has nothing to do with device time. Steady
state is reached after ~2 warm groups; we discard them and report the
median of the remaining groups. Each group chains K calls and reads
back ONE scalar depending on all of them (block_until_ready is a no-op
here).

    python -m benchmarks.sam_bench

Writes docs/sam_bench.json.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from cartseg_tpu.models.sam import Sam, SamConfig


def _steady_ms(call, k_per_group: int = 8, groups: int = 5, warm: int = 2):
    """Median per-call ms over post-warm-up groups of chained calls."""
    per = []
    for _ in range(groups):
        t0 = time.time()
        acc = 0.0
        for _ in range(k_per_group):
            acc = acc + call()
        float(acc)  # the only trustworthy sync on this runtime
        per.append((time.time() - t0) / k_per_group * 1e3)
    return float(np.median(per[warm:])), per


def main():
    cfg = SamConfig()  # full ViT-B: 12 layers, 768 dim, 1024² input
    model = Sam(cfg, dtype=jnp.bfloat16)

    t0 = time.time()
    var = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, cfg.img_size, cfg.img_size, 3)),
        jnp.zeros((1, 2, 2)), jnp.zeros((1, 2), jnp.int32)))(jax.random.key(0))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(var))
    print(f"init {time.time()-t0:.1f}s, {n_params/1e6:.1f}M params", flush=True)

    # params are jit ARGUMENTS (closing over them would bake 375 MB of
    # literals into the HLO — too large for the remote-compile transport)
    @jax.jit
    def _encode(v, x):
        return model.apply(v, model.preprocess(x), method=model.encode_image)

    @jax.jit
    def _decode(v, feats, c, l):
        return model.apply(v, feats, c, l, method=model.decode)

    # the gated bf16-softmax encoder lane (SamConfig.attn_softmax_fp32=
    # False): same params, the global blocks keep the (12,4096,4096)
    # logits bf16 with an fp32-accumulated row sum instead of an 805 MB
    # fp32 materialization per block
    import dataclasses
    model_b = Sam(dataclasses.replace(cfg, attn_softmax_fp32=False),
                  dtype=jnp.bfloat16)

    @jax.jit
    def _encode_b(v, x):
        return model_b.apply(v, model_b.preprocess(x),
                             method=model_b.encode_image)

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, 255, (1, cfg.img_size, cfg.img_size, 3), np.uint8)
    ).astype(jnp.float32)

    t0 = time.time()
    feats = _encode(var, x)
    float(feats.sum())
    print(f"encode compile+first {time.time()-t0:.1f}s", flush=True)

    enc_ms, enc_groups = _steady_ms(lambda: _encode(var, x).sum())
    print(f"image embedding: {enc_ms:.1f} ms/img steady "
          f"(groups: {['%.0f' % g for g in enc_groups]})", flush=True)

    t0 = time.time()
    feats_b = _encode_b(var, x)
    rel = float(jnp.abs(feats_b.astype(jnp.float32)
                        - feats.astype(jnp.float32)).max()
                / (jnp.abs(feats.astype(jnp.float32)).max() + 1e-9))
    print(f"bf16-softmax encode compile+first {time.time()-t0:.1f}s "
          f"(max rel dev vs fp32-softmax lane: {rel:.4f})", flush=True)
    encb_ms, encb_groups = _steady_ms(lambda: _encode_b(var, x).sum())
    print(f"image embedding (bf16 softmax): {encb_ms:.1f} ms/img steady "
          f"(groups: {['%.0f' % g for g in encb_groups]})", flush=True)

    # flash-attention lane: global blocks through the Pallas kernel
    # (ops/pallas/flash_attention.py), fp32 online softmax
    model_f = Sam(dataclasses.replace(cfg, global_attn_flash=True),
                  dtype=jnp.bfloat16)

    @jax.jit
    def _encode_f(v, xx):
        return model_f.apply(v, model_f.preprocess(xx),
                             method=model_f.encode_image)

    t0 = time.time()
    feats_f = _encode_f(var, x)
    rel_f = float(jnp.abs(feats_f.astype(jnp.float32)
                          - feats.astype(jnp.float32)).max()
                  / (jnp.abs(feats.astype(jnp.float32)).max() + 1e-9))
    print(f"flash encode compile+first {time.time()-t0:.1f}s "
          f"(max rel dev vs fp32-softmax lane: {rel_f:.4f})", flush=True)
    encf_ms, encf_groups = _steady_ms(lambda: _encode_f(var, x).sum())
    print(f"image embedding (flash global attn): {encf_ms:.1f} ms/img "
          f"steady (groups: {['%.0f' % g for g in encf_groups]})",
          flush=True)

    coords = jnp.asarray([[[512.0, 400.0], [0.0, 0.0]]])
    labels = jnp.asarray([[1, -1]], jnp.int32)
    t0 = time.time()
    m, iou = _decode(var, feats, coords, labels)
    float(m.sum())
    print(f"decode compile+first {time.time()-t0:.1f}s", flush=True)

    dec_ms, dec_groups = _steady_ms(
        lambda: _decode(var, feats, coords, labels)[0].sum(),
        k_per_group=16)
    print(f"prompt decode: {dec_ms:.2f} ms/prompt steady "
          f"(groups: {['%.1f' % g for g in dec_groups]})", flush=True)

    out = {
        "model": "SAM ViT-B (flax, bf16)",
        "params_m": round(n_params / 1e6, 1),
        "image_embedding_ms": round(enc_ms, 1),
        "image_embedding_bf16_softmax_ms": round(encb_ms, 1),
        "image_embedding_flash_ms": round(encf_ms, 1),
        "bf16_softmax_max_rel_dev": round(rel, 4),
        "flash_max_rel_dev": round(rel_f, 4),
        "prompt_decode_ms": round(dec_ms, 2),
        "embedding_groups_ms": [round(g, 1) for g in enc_groups],
        "embedding_bf16_softmax_groups_ms": [round(g, 1) for g in encb_groups],
        "embedding_flash_groups_ms": [round(g, 1) for g in encf_groups],
        "decode_groups_ms": [round(g, 2) for g in dec_groups],
        "note": ("steady-state after relay warm-up; first-execute "
                 "overhead on this runtime is 150-450 ms/call for "
                 "~8 calls and is NOT device time"),
    }
    path = Path(__file__).resolve().parent.parent / "docs" / "sam_bench.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
