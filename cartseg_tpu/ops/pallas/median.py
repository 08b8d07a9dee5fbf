"""Exact per-row median as a VMEM-resident Pallas selection kernel.

The QC stat fg_conf is a median over H*W confidences per image
(reference create_pseudo_labels.py:233-240 computes np.median). XLA
lowers jnp.median to a full lax.sort — at bs64@512^2 that sort is the
single most expensive non-model op of the fused pseudo-label program
(23.5 ms, docs/roofline_infer.json). A median needs no sort: this
kernel loads each row into VMEM ONCE and finds the two middle order
statistics by 31-step binary search on the int32 bit patterns
(IEEE-754 order == integer order for non-negative floats), counting
ranks with VPU compare+reduce passes over the VMEM-resident row.
HBM traffic: one read of the data, a few lanes out.

Exactness: the search returns the smallest bit pattern v with
rank(v) >= k+1, which is itself an element of the row — the k-th
order statistic, bit-for-bit. np.median parity (average of the two
middle elements for even n) then holds to f32 rounding.

Precondition: values must be non-negative (the int32-bits order trick
breaks for negative floats). Every caller here feeds |p-0.5|*2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cartseg_tpu.ops.pallas.common import interpret_mode

_SUBLANE = 8
_LANE = 128


def _median_kernel(bits_ref, lo_l_ref, lo_h_ref, *, n: int):
    bits = bits_ref[0]                          # [R, 128] s32, >= 0
    k_lo = jnp.int32((n - 1) // 2)              # 0-indexed middle pair
    k_hi = jnp.int32(n // 2)

    def rank_count(mid):
        le = (bits <= mid).astype(jnp.int32)
        return jnp.sum(jnp.sum(le, axis=1), axis=0)

    def body(_, state):
        lo1, hi1, lo2, hi2 = state
        m1 = lo1 + (hi1 - lo1) // 2
        m2 = lo2 + (hi2 - lo2) // 2
        c1 = rank_count(m1)
        c2 = rank_count(m2)
        lo1, hi1 = jnp.where(c1 >= k_lo + 1, lo1, m1 + 1), \
            jnp.where(c1 >= k_lo + 1, m1, hi1)
        lo2, hi2 = jnp.where(c2 >= k_hi + 1, lo2, m2 + 1), \
            jnp.where(c2 >= k_hi + 1, m2, hi2)
        return lo1, hi1, lo2, hi2

    top = jnp.int32(2 ** 31 - 1)
    lo1, _, lo2, _ = jax.lax.fori_loop(
        0, 31, body, (jnp.int32(0), top, jnp.int32(0), top))
    lo_l_ref[0] = jnp.full((_SUBLANE, _LANE), lo1, jnp.int32)
    lo_h_ref[0] = jnp.full((_SUBLANE, _LANE), lo2, jnp.int32)


def fits_vmem(n: int, budget_bytes: int = 12 * 2 ** 20) -> bool:
    return n % _LANE == 0 and 2 * n * 4 <= budget_bytes


@functools.partial(jax.jit, static_argnames=())
def _median_pallas(x):
    B, N = x.shape
    bits = jax.lax.bitcast_convert_type(
        x.astype(jnp.float32), jnp.int32).reshape(B, N // _LANE, _LANE)
    out_shape = jax.ShapeDtypeStruct((B, _SUBLANE, _LANE), jnp.int32)
    lo_l, lo_h = pl.pallas_call(
        functools.partial(_median_kernel, n=N),
        out_shape=(out_shape, out_shape),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, N // _LANE, _LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, _SUBLANE, _LANE), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, _SUBLANE, _LANE), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 2 ** 20),
        interpret=interpret_mode(),
    )(bits)
    v_lo = jax.lax.bitcast_convert_type(lo_l[:, 0, 0], jnp.float32)
    v_hi = jax.lax.bitcast_convert_type(lo_h[:, 0, 0], jnp.float32)
    return 0.5 * (v_lo + v_hi)


def median_nonneg_last_axis(x):
    """[..., N] non-negative floats -> [...] exact median over the last
    axis (np.median semantics: mean of the two middle order statistics
    for even N). Dispatches to the VMEM selection kernel on TPU when
    the row fits (CARTSEG_PALLAS_MEDIAN=0 opts out); jnp.median (sort)
    otherwise — also the kernel's parity oracle."""
    import os

    shape = x.shape
    N = shape[-1]
    use_pallas = (os.environ.get("CARTSEG_PALLAS_MEDIAN", "1") != "0"
                  and jax.default_backend() == "tpu")
    if not (use_pallas and fits_vmem(N)):
        return jnp.median(x, axis=-1)
    flat = x.reshape(-1, N)
    return _median_pallas(flat).reshape(shape[:-1])
