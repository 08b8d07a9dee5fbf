"""Roofline attribution of the headline train step (VERDICT r2 weak #4).

For every hot op in a REAL device trace of the bench.py step, computes
bytes moved (sum of operand + output buffer sizes from the compiled
HLO) and, for conv fusions, MXU FLOPs — then tables attained GB/s and
TFLOP/s against the chip peaks. This converts "the reduce tail looks
HBM-bound" from a guess into a measurement: an op at >=80% of HBM
bandwidth is a proven wall; an op far below both rooflines is headroom
(latency / lane-utilization bound, worth a layout or kernel
experiment).

Peaks (TPU v5e / v5 lite, public spec): 197 bf16 TFLOP/s, 819 GB/s HBM.

    python tools/roofline.py [--img 224] [--batch 128] [--steps 8]

Writes docs/roofline.json; the summary table goes into
docs/BENCHMARKS.md by hand.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

import numpy as np

import jax

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.trace_step import build_step, aggregate_trace  # noqa: E402

HBM_GBPS = 819.0       # v5e HBM bandwidth
MXU_TFLOPS = 197.0     # v5e bf16 peak

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "token": 0,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """Bytes of a (possibly tuple) HLO shape string. Ignores TPU tile
    padding — a slight undercount for tensors whose minor dims don't
    fill the (8,128) tile, so attained-GB/s figures are lower bounds."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def parse_defs(hlo: str):
    """name -> (shape_str, full_line) for every HLO instruction.

    Tuple shapes may nest parens inside layout annotations (e.g.
    `(s32[...]{1,0:T(8,128)}, ...)`), so the tuple alternative allows
    one level of nesting — without it every sort/while row degraded to
    'no HLO def' in the roofline table."""
    defs = {}
    for m in re.finditer(
            r"^\s*(?:ROOT )?%?([\w.\-]+) = "
            r"(\((?:[^()]|\([^()]*\))*\)|\S+) ([a-z][\w\-]*)\(",
            hlo, re.M):
        defs[m.group(1)] = (m.group(2), m.group(0), m.group(3))
    return defs


def op_operands(hlo_line_start: str, hlo: str, name: str):
    """Operand names of instruction `name` (top-level call site)."""
    m = re.search(rf"^\s*(?:ROOT )?%?{re.escape(name)} = .*$", hlo, re.M)
    if not m:
        return []
    line = m.group(0)
    # operands are %refs inside the first (...) after the op kind
    call = re.search(r"[a-z][\w\-]*\((.*)$", line)
    if not call:
        return []
    return re.findall(r"%([\w.\-]+)", call.group(1))


def conv_flops_in(fusion_name: str, hlo: str, defs) -> float:
    """Total conv MACs*2 inside a fusion's called computation (or the
    op itself if it is a bare convolution)."""
    line = defs.get(fusion_name, ("", "", ""))[1]
    m = re.search(rf"%?{re.escape(fusion_name)} = [^\n]*$", hlo, re.M)
    if m:
        line = m.group(0)
    bodies = [line]
    cm = re.search(r"calls=%?([\w.\-]+)", line)
    if cm:
        b = re.search(rf"%?{re.escape(cm.group(1))} [^\n]*\{{(.*?)\n\}}",
                      hlo, re.S)
        if b:
            bodies.append(b.group(1))
    flops = 0.0
    for body in bodies:
        for cv in re.finditer(
                r"= (\S+) convolution\(([^)]*)\), window=\{([^}]*)\}, "
                r"dim_labels=(\S+)", body):
            out_shape, args, window, labels = cv.groups()
            # out elements
            out_n = 1
            sm = _SHAPE_RE.search(out_shape)
            if not sm:
                continue
            for d in sm.group(2).split(","):
                if d:
                    out_n *= int(d)
            # kernel spatial size from window
            ksz = 1
            wm = re.search(r"size=([\dx]+)", window)
            if wm:
                for d in wm.group(1).split("x"):
                    ksz *= int(d)
            # input feature count: operand 0's channel dim via dim_labels
            # labels like b01f_01io->b01f : input channels = rhs 'i' dim
            opnames = re.findall(r"%([\w.\-]+)", args)
            cin = 1
            if len(opnames) >= 2 and opnames[1] in defs:
                rhs_shape = defs[opnames[1]][0]
                rm = _SHAPE_RE.search(rhs_shape)
                lbl = labels.split("->")[0].split("_")[1]  # rhs labels
                if rm and "i" in lbl:
                    dims = [int(d) for d in rm.group(2).split(",") if d]
                    if len(dims) == len(lbl):
                        cin = dims[lbl.index("i")]
            flops += 2.0 * out_n * ksz * cin
    return flops


def build_infer(img, batch, members=3):
    """The fused pseudo-label program (ensemble + flip TTA + CC clean +
    QC — infer/engine.py pseudo_label_program) as (fn, args, sync)."""
    import jax.numpy as jnp

    from cartseg_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD
    from cartseg_tpu.infer.engine import (EnsembleMember,
                                          pseudo_label_program)
    from cartseg_tpu.models import build_model, init_model

    model = build_model("efficientnet-b0", dtype=jnp.bfloat16)
    ms = []
    for i in range(members):
        v = init_model(model, jax.random.key(i), (1, 64, 64, 3))
        ms.append(EnsembleMember(model, v, 1.0))
    program = pseudo_label_program(ms, IMAGENET_MEAN, IMAGENET_STD,
                                   int(img * img * 0.001))
    rng = np.random.default_rng(0)
    base = rng.random((batch, 32, 32, 3)).astype(np.float32)
    up = np.asarray(jax.image.resize(jnp.asarray(base),
                                     (batch, img, img, 3), "linear"))
    imgs = jnp.asarray((up * 255).astype(np.uint8))
    return program, (imgs, jnp.float32(0.5))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--program", default="train",
                    choices=["train", "infer"],
                    help="train = bench.py headline step; infer = the "
                         "fused pseudo-label ensemble program")
    ap.add_argument("--out", default=None,
                    help="output json (default roofline.json for train, "
                         "roofline_infer.json for infer)")
    ns = ap.parse_args(argv)
    assert jax.default_backend() == "tpu"

    if ns.program == "train":
        step, state = build_step(ns.img, ns.batch)
        params, stats, opt, images, masks = state

        def run_once(key):
            nonlocal params, stats, opt
            params, stats, opt, loss = step(params, stats, opt, images,
                                            masks, key)
            return loss

        lower_args = lambda: (params, stats, opt, images, masks,
                              jax.random.key(0))
        shape_desc = (f"resnet34-UNet bs{ns.batch}@{ns.img}^2 bf16 "
                      "full step")
    else:
        program, (imgs, thr) = build_infer(ns.img, ns.batch)

        def run_once(key):
            pred, probs, stats_d = program(imgs, thr)
            return stats_d["fg_area"].sum() + pred.sum()

        lower_args = lambda: (imgs, thr)
        shape_desc = (f"pseudo-label 3x effnet-b0 ensemble + TTA + CC + "
                      f"QC bs{ns.batch}@{ns.img}^2 bf16")
        step = program

    key = jax.random.key(1)
    for _ in range(3):
        key, k = jax.random.split(key)
        loss = run_once(k)
    float(loss)

    tracedir = "/tmp/roofline_trace"
    jax.profiler.start_trace(tracedir)
    for _ in range(ns.steps):
        key, k = jax.random.split(key)
        loss = run_once(k)
    float(loss)
    jax.profiler.stop_trace()

    compiled = step.lower(*lower_args()).compile()
    hlo = compiled.as_text()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost

    report = aggregate_trace(tracedir, ns.steps, hlo)
    defs = parse_defs(hlo)

    # per-instruction rows (hot_fusions keeps the .N suffixes that map
    # 1:1 onto HLO instruction names; the aggregated table does not)
    rows = []
    for h in report["hot_fusions"][:ns.top]:
        name = h["op"]
        ms = h["ms_per_step"]
        if name not in defs:
            rows.append({"op": name, "ms": ms, "note": "no HLO def"})
            continue
        out_shape = defs[name][0]
        out_b = shape_bytes(out_shape)
        in_b = 0
        for o in op_operands(defs[name][1], hlo, name):
            if o in defs:
                in_b += shape_bytes(defs[o][0])
        total_b = in_b + out_b
        gbps = total_b / (ms * 1e-3) / 1e9 if ms > 0 else 0.0
        fl = conv_flops_in(name, hlo, defs)
        tfl = fl / (ms * 1e-3) / 1e12 if ms > 0 else 0.0
        rows.append({
            "op": name, "ms": ms,
            "bytes_mb": round(total_b / 1e6, 2),
            "attained_gbps": round(gbps, 1),
            "pct_hbm_peak": round(100 * gbps / HBM_GBPS, 1),
            "conv_tflops": round(tfl, 2),
            "pct_mxu_peak": round(100 * tfl / MXU_TFLOPS, 1),
            "out_shape": out_shape.split("{")[0],
        })

    step_ms = report["device_busy_ms_per_step"]
    total_flops = float(cost.get("flops", 0.0)) if cost else 0.0
    total_bytes = float(cost.get("bytes accessed", 0.0)) if cost else 0.0
    summary = {
        "shape": shape_desc,
        "device_busy_ms_per_step": step_ms,
        "total_flops_G": round(total_flops / 1e9, 1),
        "total_bytes_GB": round(total_bytes / 1e9, 3),
        "attained_tflops": round(total_flops / (step_ms * 1e-3) / 1e12, 1),
        "pct_mxu_peak": round(100 * total_flops / (step_ms * 1e-3) / 1e12
                              / MXU_TFLOPS, 1),
        "hbm_time_bound_ms": round(total_bytes / 1e9 / HBM_GBPS * 1e3, 2),
        "mxu_time_bound_ms": round(total_flops / 1e12 / MXU_TFLOPS * 1e3,
                                   2),
        "peaks": {"hbm_gbps": HBM_GBPS, "mxu_bf16_tflops": MXU_TFLOPS},
        # full per-base-op attribution (the .N instances of each op
        # summed; sums to device_busy): the table that shows e.g. the
        # depthwise block's convert_reduce_fusion total next to the
        # Pallas kernels
        "agg_by_op_ms": report["all_ops_ms_per_step"],
        "rows": rows,
    }
    print(json.dumps(summary, indent=1))
    default_name = ("roofline.json" if ns.program == "train"
                    else "roofline_infer.json")
    if ns.program == "train" and (ns.img, ns.batch) != (224, 128):
        default_name = f"roofline_{ns.img}_{ns.batch}.json"
    (REPO / "docs" / (ns.out or default_name)).write_text(
        json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
