"""VMEM-resident jump-flood EDT Pallas kernel (ROADMAP #2).

The XLA JFA in ops/edt.py does ~10 sweeps x 8 neighbor shift-compares,
each a separate HBM round-trip over three f32 maps (by/bx/d2) — ~80
bandwidth-bound passes per image. This kernel keeps the whole state in
VMEM for the entire flood: one HBM read of the seed map, one HBM write
of the distance map, everything between runs at VPU speed.

Two extra tricks vs the XLA version:
  * the shifted-in fill is a far-away coordinate (-4096) instead of an
    explicit validity map, so the d2 plane itself is never shifted —
    2 rolls per candidate instead of 3;
  * per-batch-sample grid steps: each 512x512 f32 state set (~6 working
    planes ≈ 6 MB) fits VMEM; larger images fall back to the XLA path
    (callers use `edt_batch`, which guards).

No VJP: every call site feeds label-derived or stop_gradient'ed masks
(losses/abl.py:gt_dist_maps, losses/boundary.py:batch_sdf), matching
the reference where dist maps are constants built from labels
(reference src/training/losses/abl.py:165-171, scipy on CPU).

Semantics == ops.edt.edt (1+JFA): distance from every pixel to the
nearest True seed; +inf (1e6 here) when a sample has no seeds — callers
guard with `seeds.any()` exactly as for the XLA lane.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cartseg_tpu.ops.pallas.common import interpret_mode

_FAR = -4096.0       # fill coordinate: (4096)^2 >> any real d2 at <=2048^2
_INF = 1e12
_VMEM_PLANES = 10    # working planes (state + temps), VMEM guard


def _jfa_steps(h: int, w: int):
    n = max(h, w)
    k = 1
    while k * 2 < n:
        k *= 2
    steps = []
    while k >= 1:
        steps.append(k)
        k //= 2
    steps.append(1)  # the "+1" of 1+JFA
    return steps


def _shift(a, dy: int, dx: int, rows, cols, h: int, w: int):
    """Static-offset 2-D shift with far-away fill (no validity plane).

    pltpu.roll only takes non-negative shifts; a circular roll by
    `s % dim` is identical for any sign, and the validity mask below
    blanks every wrapped-in (or fully out-of-range, |s| >= dim) lane.
    """
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
    return jnp.where(valid, out, _FAR)


def _edt_kernel(seeds_ref, dist_ref, *, h: int, w: int):
    seed = seeds_ref[0] > 0.5
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    ys = rows.astype(jnp.float32)
    xs = cols.astype(jnp.float32)

    by = jnp.where(seed, ys, _FAR)
    bx = jnp.where(seed, xs, _FAR)
    d2 = jnp.where(seed, 0.0, _INF)

    for k in _jfa_steps(h, w):
        for dy in (-k, 0, k):
            for dx in (-k, 0, k):
                if dy == 0 and dx == 0:
                    continue
                cby = _shift(by, dy, dx, rows, cols, h, w)
                cbx = _shift(bx, dy, dx, rows, cols, h, w)
                nd2 = (ys - cby) ** 2 + (xs - cbx) ** 2
                better = nd2 < d2
                by = jnp.where(better, cby, by)
                bx = jnp.where(better, cbx, bx)
                d2 = jnp.where(better, nd2, d2)

    # A far-fill candidate (d2 >= 4096^2) can only win when the sample
    # has no seeds at all; report the XLA lane's sqrt(1e12) sentinel
    # there so both lanes agree bit-for-bit on the guard value.
    dist_ref[0] = jnp.where(d2 >= _FAR * _FAR * 0.9,
                            jnp.sqrt(jnp.float32(_INF)), jnp.sqrt(d2))


def fits_vmem(h: int, w: int, budget_bytes: int = 14 * 2 ** 20) -> bool:
    return _VMEM_PLANES * h * w * 4 <= budget_bytes


@functools.partial(jax.jit, static_argnames=())
def edt_batch_pallas(seeds):
    """[B,H,W] bool/float seeds -> [B,H,W] f32 distance maps, one grid
    step per sample, flood fully in VMEM."""
    B, H, W = seeds.shape
    x = jnp.asarray(seeds, jnp.float32)
    return pl.pallas_call(
        functools.partial(_edt_kernel, h=H, w=W),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
    )(x)
