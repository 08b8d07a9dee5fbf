"""HLO-level attribution of the SAM ViT-B image-embedding program from
a real device trace, PAST the relay's per-executable warm-up (the first
~8 executes carry large host-side overhead that is not device time —
docs/BENCHMARKS.md "SAM").

    python tools/trace_sam.py [--steps 8]

Writes docs/sam_trace.json.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.trace_step import aggregate_trace  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ns = ap.parse_args(argv)
    assert jax.default_backend() == "tpu"

    from cartseg_tpu.models.sam import ImageEncoderViT, SamConfig

    cfg = SamConfig()
    enc = ImageEncoderViT(cfg, jnp.bfloat16)
    var = jax.jit(lambda k: enc.init(
        k, jnp.zeros((1, 1024, 1024, 3))))(jax.random.key(0))

    @jax.jit
    def fwd(v, x):
        return enc.apply(v, x)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 255, (1, 1024, 1024, 3),
                                 np.uint8)).astype(jnp.float32)

    # 16 warm calls: past compile AND the relay's per-executable warm-up
    acc = 0.0
    for _ in range(16):
        acc = acc + fwd(var, x).sum()
    float(acc)

    tracedir = "/tmp/sam_trace"
    jax.profiler.start_trace(tracedir)
    acc = 0.0
    for _ in range(ns.steps):
        acc = acc + fwd(var, x).sum()
    float(acc)
    jax.profiler.stop_trace()

    hlo = fwd.lower(var, x).compile().as_text()
    report = aggregate_trace(tracedir, ns.steps, hlo)
    report["shape"] = "SAM ViT-B image encoder, 1x1024^2, bf16"
    print(json.dumps(report, indent=1))
    (REPO / "docs" / "sam_trace.json").write_text(
        json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
