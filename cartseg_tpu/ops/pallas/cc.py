"""VMEM-resident connected-components propagation Pallas kernel.

The XLA lane in ops/connected_components.py runs each propagation
sweep as ~40 shift/min/select kernels over HBM — at bs64@512^2 that is
~8 ms per sweep and the 512^2 pseudo-label QC batch spends ~190 ms in
CC (docs/roofline_infer.json). This kernel keeps one image's label
plane in VMEM for the ENTIRE propagation: one HBM read of the mask,
one HBM write of the converged labels, every sweep in between at VPU
speed. Same algorithm as the XLA lane (segmented row/col min-scans by
shift doubling + diagonal hops, min-flat-index labels, fixpoint loop),
so results are bit-identical — the XLA lane doubles as its oracle.

Replaces cv2.connectedComponentsWithStats' labeling half on device
(reference create_pseudo_labels.py:124-138, remove_blops.py:14-33);
per-component statistics stay in ops/connected_components.py (sorts).

Mosaic notes (v5e, jax 0.9): everything stays 2-D [h, w]; shifts are
pltpu.roll + iota validity select (the ops/pallas/edt.py idiom — roll
takes non-negative shifts only, and wrapped-in lanes are blanked with
the fill value); booleans are kept as s32 0/1 planes because Mosaic
rolls of pred arrays are not supported; the convergence any-compare
reduces one axis at a time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cartseg_tpu.ops.pallas.common import interpret_mode

_VMEM_PLANES = 14    # label plane + fg + shifted temps + the 4
                     # bit-packed ladder planes of the default lane


def _shift_fill(a, dy: int, dx: int, fill, rows, cols, h: int, w: int):
    """Static-offset 2-D shift with constant fill (edt.py's _shift)."""
    out = a
    if dy % h:
        out = pltpu.roll(out, dy % h, axis=0)
    if dx % w:
        out = pltpu.roll(out, dx % w, axis=1)
    valid = None
    if dy > 0:
        valid = rows >= dy
    elif dy < 0:
        valid = rows < h + dy
    if dx > 0:
        vx = cols >= dx
        valid = vx if valid is None else valid & vx
    elif dx < 0:
        vx = cols < w + dx
        valid = vx if valid is None else valid & vx
    return jnp.where(valid, out, fill)


def _propagate(fg, lab0, *, h: int, w: int, connectivity: int,
               max_iter: int, ladder: bool = False):
    """Min-propagation fixpoint of lab0 over the fg domain — the shared
    VMEM core of connected-components labeling (lab0 = flat index) and
    hysteresis reachability (lab0 = 0 at seeds)."""
    size = jnp.int32(h * w)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def shift(a, dy, dx, fill):
        return _shift_fill(a, dy, dx, fill, rows, cols, h, w)

    # run-connectivity masks: fg never changes across sweeps, so the
    # per-level masks are sweep-invariant. Default lane recomputes them
    # in-flight each scan (precomputing one PLANE per level measured a
    # scoped-vmem OOM at 512^2); the `ladder` lane instead BIT-PACKS
    # level l of each (axis, direction) ladder into bit l of a single
    # s32 plane (<= log2(512) = 9 bits), built once before the
    # fixpoint: 4 extra planes total, and each sweep level pays one
    # AND+compare instead of rebuilding the mask (A/B:
    # benchmarks/cc_ladder_bench.py).
    packs = {}
    if ladder:
        for axis in (1, 0):
            n = w if axis == 1 else h
            for sgn in (1, -1):
                d = (0, sgn) if axis == 1 else (sgn, 0)
                r = fg * shift(fg, d[0], d[1], 0)
                packed = r                      # level k=1 -> bit 0
                k, lvl = 1, 1
                while 2 * k < n:
                    rs = (shift(r, 0, sgn * k, 0) if axis == 1
                          else shift(r, sgn * k, 0, 0))
                    r = r * rs
                    packed = packed + (r << lvl)
                    k *= 2
                    lvl += 1
                packs[(axis, sgn)] = packed

    def run_min(v, axis):
        n = w if axis == 1 else h
        for sgn in (1, -1):
            if ladder:
                packed = packs[(axis, sgn)]
                k, lvl = 1, 0
                while k < n:
                    if axis == 1:
                        vs = shift(v, 0, sgn * k, size)
                    else:
                        vs = shift(v, sgn * k, 0, size)
                    v = jnp.where((packed & (1 << lvl)) > 0,
                                  jnp.minimum(v, vs), v)
                    k *= 2
                    lvl += 1
                continue
            d = (0, sgn) if axis == 1 else (sgn, 0)
            r = fg * shift(fg, d[0], d[1], 0)
            k = 1
            while k < n:
                if axis == 1:
                    vs = shift(v, 0, sgn * k, size)
                else:
                    vs = shift(v, sgn * k, 0, size)
                v = jnp.where(r > 0, jnp.minimum(v, vs), v)
                if 2 * k < n:
                    rs = (shift(r, 0, sgn * k, 0) if axis == 1
                          else shift(r, sgn * k, 0, 0))
                    r = r * rs
                k *= 2
        return v

    def sweep(v):
        if connectivity == 8:
            m = v
            for dy in (-1, 1):
                for dx in (-1, 1):
                    m = jnp.minimum(m, shift(v, dy, dx, size))
            v = jnp.where(fg > 0, m, size)
        # 4-connectivity needs no neighbor hop: lateral/vertical fg
        # adjacency is exactly same-run membership in the scans
        v = run_min(v, 1)
        v = run_min(v, 0)
        return jnp.where(fg > 0, v, size)

    def cond(state):
        _, changed, i = state
        return changed & (i < max_iter)

    def body(state):
        v, _, i = state
        nv = sweep(v)
        ne = (nv != v).astype(jnp.int32)
        changed = jnp.sum(jnp.sum(ne, axis=1), axis=0) > 0
        return nv, changed, i + 1

    lab, _, _ = jax.lax.while_loop(
        cond, body, (lab0, jnp.bool_(True), jnp.int32(0)))
    return lab


def _ladder_enabled() -> bool:
    """Bit-packed run-mask ladders, DEFAULT ON: measured 1.31x (cc) /
    1.13x (reach) at bs64@512^2 with on-chip bit parity
    (docs/cc_ladder_bench.json). CARTSEG_CC_LADDER=0 restores the
    recompute-in-sweep lane."""
    import os
    return os.environ.get("CARTSEG_CC_LADDER", "1") != "0"


def _cc_kernel(mask_ref, lab_ref, *, h: int, w: int, connectivity: int,
               max_iter: int, ladder: bool = False):
    size = jnp.int32(h * w)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    fg = mask_ref[0].astype(jnp.int32)          # 0/1 plane
    lab0 = jnp.where(fg > 0, rows * w + cols, size)
    lab_ref[0] = _propagate(fg, lab0, h=h, w=w, connectivity=connectivity,
                            max_iter=max_iter, ladder=ladder)


def _reach_kernel(weak_ref, strong_ref, out_ref, *, h: int, w: int,
                  connectivity: int, max_iter: int, ladder: bool = False):
    size = jnp.int32(h * w)
    fg = weak_ref[0].astype(jnp.int32)
    seed = strong_ref[0].astype(jnp.int32)
    lab0 = jnp.where((fg > 0) & (seed > 0), 0, size)
    lab = _propagate(fg, lab0, h=h, w=w, connectivity=connectivity,
                     max_iter=max_iter, ladder=ladder)
    out_ref[0] = ((fg > 0) & (lab == 0)).astype(jnp.int32)


def fits_vmem(h: int, w: int, budget_bytes: int = 14 * 2 ** 20) -> bool:
    return _VMEM_PLANES * h * w * 4 <= budget_bytes


def cc_batch_pallas(mask, connectivity: int = 8, max_iter: int = 4096,
                    ladder=None):
    """[B,H,W] bool -> [B,H,W] s32 labels (min flat index per
    component; H*W on background), one grid step per sample, the whole
    fixpoint in VMEM. `ladder` (default: CARTSEG_CC_LADDER env)
    selects the bit-packed run-mask lane; resolved OUTSIDE the jit
    cache so per-call overrides are honored."""
    if ladder is None:
        ladder = _ladder_enabled()
    return _cc_batch_jit(mask, connectivity, max_iter, bool(ladder))


@functools.partial(jax.jit,
                   static_argnames=("connectivity", "max_iter", "ladder"))
def _cc_batch_jit(mask, connectivity: int, max_iter: int, ladder: bool):
    B, H, W = mask.shape
    x = jnp.asarray(mask, jnp.int32)
    return pl.pallas_call(
        functools.partial(_cc_kernel, h=H, w=W,
                          connectivity=connectivity, max_iter=max_iter,
                          ladder=ladder),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret_mode(),
    )(x)


def reach_batch_pallas(weak, strong, connectivity: int = 8,
                       max_iter: int = 4096, ladder=None):
    """[B,H,W] bool x2 -> [B,H,W] bool: pixels of `weak` connected to a
    `strong` pixel through weak pixels (seeds outside `weak` are
    ignored). The Canny double-threshold hysteresis rule
    (ops/edges.py:canny_edges; cv2.Canny semantics) as ONE VMEM-resident
    fixpoint instead of a batched dilate-while-loop over HBM."""
    if ladder is None:
        ladder = _ladder_enabled()
    return _reach_batch_jit(weak, strong, connectivity, max_iter,
                            bool(ladder))


@functools.partial(jax.jit,
                   static_argnames=("connectivity", "max_iter", "ladder"))
def _reach_batch_jit(weak, strong, connectivity: int, max_iter: int,
                     ladder: bool):
    B, H, W = weak.shape
    out = pl.pallas_call(
        functools.partial(_reach_kernel, h=H, w=W,
                          connectivity=connectivity, max_iter=max_iter,
                          ladder=ladder),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret_mode(),
    )(jnp.asarray(weak, jnp.int32), jnp.asarray(strong, jnp.int32))
    return out.astype(bool)
