"""Measured floor for a hypothetical Pallas depthwise-conv rewrite.

docs/roofline_infer.json shows the effnet depthwise+SE fusions at
65 ms/batch — the largest single block of the fused pseudo-label
program. Whether a VMEM Pallas kernel could beat XLA's depthwise
emitters reduces to one number: the sustained rate of the per-tap op
mix (shift + edge-validity select + multiply-accumulate) on the VPU
under Mosaic. This probe times exactly that — a Pallas kernel running
CHAIN serially-accumulated taps over a VMEM-resident block, the inner
loop any shifted-window depthwise kernel would run — plus the same mix
through the XLA lane (jnp.roll chains) for reference.

Verdict math (written into the json): the three ensemble members'
depthwise layers total ~71 G MACs per bs64@512^2 batch (k3/k5 taps x
HxWxC over the 16 MBConv blocks, TTA batch 128). XLA's emitters do
that in 65 ms = ~1.09 T taps/s sustained. A Pallas kernel needs its
measured tap rate to EXCEED that to be worth writing.

    python -m benchmarks.vpu_probe

Writes docs/vpu_probe.json.
"""

from __future__ import annotations

import functools
import json
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent

H, W = 512, 512      # one VMEM-resident f32 plane, as in ops/pallas/cc.py
CHAIN = 128          # taps per kernel invocation
GRID = 32            # independent planes (grid steps) per dispatch
STEPS = 8

DW_MACS_PER_BATCH_G = 71.0   # see BENCHMARKS.md derivation
DW_EMITTER_MS = 65.0         # docs/roofline_infer.json round-5 sum


def _pallas_tap_rate():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        x = x_ref[0]
        cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        acc = x * 0.5
        for i in range(CHAIN):
            k = 1 + (i % 4)
            s = pltpu.roll(x, k, axis=1)         # shift
            s = jnp.where(cols >= k, s, 0.0)     # edge validity
            acc = acc + s * (0.5 + 1e-6 * i)     # multiply-accumulate
            if i % 8 == 7:
                # fold acc back so the chain can't be algebraically
                # collapsed; keeps values bounded
                x = acc * 1e-3
        o_ref[0] = acc

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((GRID, H, W), jnp.float32),
            grid=(GRID,),
            in_specs=[pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(x)

    x = jnp.asarray(np.random.default_rng(0).random((GRID, H, W)),
                    jnp.float32)
    y = run(x)
    float(jnp.sum(y))          # warm + readback sync
    t0 = time.time()
    for _ in range(STEPS):
        y = run(y)
    float(jnp.sum(y))
    dt = (time.time() - t0) / STEPS
    taps = GRID * H * W * CHAIN
    return {"s_per_dispatch": round(dt, 5),
            "taps_per_sec_T": round(taps / dt / 1e12, 3)}


def _xla_tap_rate():
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(x):
        cols = lax.broadcasted_iota(jnp.int32, (GRID, H, W), 2)
        acc = x * 0.5
        for i in range(CHAIN // 4):   # XLA lane is slow; fewer taps
            k = 1 + (i % 4)
            s = jnp.roll(x, k, axis=2)
            s = jnp.where(cols >= k, s, 0.0)
            acc = acc + s * (0.5 + 1e-6 * i)
            if i % 8 == 7:
                x = acc * 1e-3
        return acc

    x = jnp.asarray(np.random.default_rng(0).random((GRID, H, W)),
                    jnp.float32)
    y = run(x)
    float(jnp.sum(y))
    t0 = time.time()
    for _ in range(STEPS):
        y = run(y)
    float(jnp.sum(y))
    dt = (time.time() - t0) / STEPS
    taps = GRID * H * W * (CHAIN // 4)
    return {"s_per_dispatch": round(dt, 5),
            "taps_per_sec_T": round(taps / dt / 1e12, 3)}


def main():
    import jax
    assert jax.default_backend() == "tpu"
    pallas = _pallas_tap_rate()
    xla = _xla_tap_rate()
    emitter_taps_T = DW_MACS_PER_BATCH_G / DW_EMITTER_MS  # G/ms == T/s
    res = {
        "pallas_tap_mix": pallas,
        "xla_roll_tap_mix": xla,
        "xla_dw_emitter_effective_taps_T": round(emitter_taps_T, 3),
        "meta": {
            "date": time.strftime("%Y-%m-%d"),
            "tap": "pltpu.roll/jnp.roll + validity select + fma over "
                   f"a VMEM f32 [{H},{W}] plane, {CHAIN} taps/plane",
            "verdict": "a Pallas depthwise rewrite wins only if "
                       "pallas_tap_mix.taps_per_sec_T > "
                       "xla_dw_emitter_effective_taps_T",
        },
    }
    print(json.dumps(res, indent=1))
    (REPO / "docs" / "vpu_probe.json").write_text(json.dumps(res,
                                                             indent=1))


if __name__ == "__main__":
    main()
