"""A/B of the bit-packed run-mask ladder lane in the VMEM CC fixpoint
(ops/pallas/cc.py `ladder`): fg is sweep-invariant, so the per-level
run-connectivity masks can be built once and bit-packed into one s32
plane per (axis, direction) ladder instead of being recomputed inside
every sweep (~2-3 vector ops saved per level per sweep, at +4 VMEM
planes).

Measures cc_batch_pallas and reach_batch_pallas both lanes on
prediction-shaped masks (smooth blobs thresholded — CC convergence
depends on component structure, same recipe as bench.py), asserts
bit-parity compiled on chip, and records the verdict.

    python -m benchmarks.cc_ladder_bench

Writes docs/cc_ladder_bench.json.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent

B, IMG = 64, 512
GROUPS = 5
WARM = 2
STEPS = 8


def _masks():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    base = rng.random((B, 32, 32)).astype(np.float32)
    up = np.asarray(jax.image.resize(jnp.asarray(base), (B, IMG, IMG),
                                     "linear"))
    return jnp.asarray(up > 0.55)


def _time(call, sync):
    per = []
    for _ in range(GROUPS):
        t0 = time.time()
        outs = [call() for _ in range(STEPS)]
        sync(outs)
        per.append((time.time() - t0) / STEPS * 1e3)
    return float(np.median(per[WARM:])), [round(p, 1) for p in per]


def main():
    import jax
    import jax.numpy as jnp

    from cartseg_tpu.ops.pallas.cc import cc_batch_pallas, reach_batch_pallas

    assert jax.default_backend() == "tpu"
    m = _masks()
    weak = m
    strong = m & (jnp.arange(IMG)[None, :, None] % 19 == 0)

    def sync(outs):
        float(jnp.stack([o.sum() for o in outs]).sum())

    rows = {}
    # compiled-on-chip parity first (the oracle relation)
    a = np.asarray(cc_batch_pallas(m, ladder=False))
    b = np.asarray(cc_batch_pallas(m, ladder=True))
    assert (a == b).all(), "cc ladder parity FAILED on chip"
    ra = np.asarray(reach_batch_pallas(weak, strong, ladder=False))
    rb = np.asarray(reach_batch_pallas(weak, strong, ladder=True))
    assert (ra == rb).all(), "reach ladder parity FAILED on chip"

    for name, call in (
        ("cc_plain", lambda: cc_batch_pallas(m, ladder=False)),
        ("cc_ladder", lambda: cc_batch_pallas(m, ladder=True)),
        ("reach_plain", lambda: reach_batch_pallas(weak, strong,
                                                   ladder=False)),
        ("reach_ladder", lambda: reach_batch_pallas(weak, strong,
                                                    ladder=True)),
    ):
        ms, groups = _time(call, sync)
        rows[name] = {"ms_per_batch": round(ms, 2), "groups_ms": groups}
        print(name, rows[name])

    out = {
        "date": time.strftime("%Y-%m-%d"),
        "shape": f"bs{B}@{IMG}^2 prediction-shaped blobs, parity "
                 "asserted on chip",
        "rows": rows,
        "cc_speedup": round(rows["cc_plain"]["ms_per_batch"]
                            / rows["cc_ladder"]["ms_per_batch"], 3),
        "reach_speedup": round(rows["reach_plain"]["ms_per_batch"]
                               / rows["reach_ladder"]["ms_per_batch"], 3),
    }
    print(json.dumps({k: v for k, v in out.items() if k != "rows"}))
    (REPO / "docs" / "cc_ladder_bench.json").write_text(
        json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
