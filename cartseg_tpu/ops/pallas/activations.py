"""Activation Pallas kernels (mish_kernel.cu, swish_kernel.cu) with
hand-derived backwards, incl. mish's overflow guard (EXP_THRESH
semantics via the softplus-stable form)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cartseg_tpu.ops.pallas.common import interpret_mode, cdiv

_LANES = 128
# 2048x128 fp32 = 1 MiB per block buffer (~4 MiB with double buffering,
# well under the ~16 MiB VMEM): large blocks amortize the per-grid-step
# Mosaic overhead that made 256-row blocks 5x slower than XLA at 25M
# elements (docs/CHIP_PARITY.md round-2 measurement).
_ROWS = 2048


def _pick_rows(n_rows: int, target: int):
    """Largest Mosaic-legal block row count <= target: a multiple of 8
    dividing n_rows, or n_rows itself (block == array dim). None if no
    legal tiling exists (caller falls back to the flatten path)."""
    if n_rows <= target:
        return n_rows
    for r in range((target // 8) * 8, 0, -8):
        if n_rows % r == 0:
            return r
    return None


def _run_2d(kernel_fn, x2, rows):
    return pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct(x2.shape, jnp.float32),
        grid=(x2.shape[0] // rows,),
        in_specs=[pl.BlockSpec((rows, x2.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, x2.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
    )(x2)


def _elementwise(kernel_fn, x):
    """Elementwise kernel dispatch. When the minor dim is already a
    lane multiple the array maps onto (rows, lanes) blocks with NO
    logical reshape across the tiled minor dims — measured on-chip,
    the generic flatten path pays ~1.1 ms relayout EACH WAY at 25M
    elements (docs/CHIP_PARITY.md), dwarfing the kernel itself."""
    shape = x.shape
    xf = jnp.asarray(x, jnp.float32)
    if len(shape) >= 2 and shape[-1] % _LANES == 0:
        x2 = xf.reshape(-1, shape[-1])  # merges MAJOR dims only: no
        #                                 relayout of the tiled minors
        rows = _pick_rows(x2.shape[0], max(8, _ROWS * _LANES // shape[-1]))
        if rows is not None:
            return _run_2d(kernel_fn, x2, rows).reshape(shape).astype(
                x.dtype)
    xf = xf.reshape(-1)
    n = xf.shape[0]
    per = _ROWS * _LANES
    n_pad = cdiv(n, per) * per - n
    if n_pad:
        xf = jnp.pad(xf, (0, n_pad))
    x2 = xf.reshape(-1, _LANES)
    out = _run_2d(kernel_fn, x2, _ROWS)
    return out.reshape(-1)[:n].reshape(shape).astype(x.dtype)


def _softplus(x):
    return jnp.where(x > 20.0, x, jnp.log1p(jnp.exp(jnp.minimum(x, 20.0))))


def _mish_fwd_kernel(x_ref, o_ref):
    x = x_ref[:]
    o_ref[:] = x * jnp.tanh(_softplus(x))


def _mish_bwd_kernel(x_ref, o_ref):
    x = x_ref[:]
    sp = _softplus(x)
    t = jnp.tanh(sp)
    sig = 1.0 / (1.0 + jnp.exp(-x))
    o_ref[:] = t + x * (1.0 - t * t) * sig


def _swish_fwd_kernel(x_ref, o_ref):
    x = x_ref[:]
    o_ref[:] = x / (1.0 + jnp.exp(-x))


def _swish_bwd_kernel(x_ref, o_ref):
    x = x_ref[:]
    s = 1.0 / (1.0 + jnp.exp(-x))
    o_ref[:] = s + x * s * (1.0 - s)


def _hswish_fwd_kernel(x_ref, o_ref):
    x = x_ref[:]
    o_ref[:] = x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _hswish_bwd_kernel(x_ref, o_ref):
    x = x_ref[:]
    o_ref[:] = jnp.where(x <= -3.0, 0.0,
                         jnp.where(x >= 3.0, 1.0, (2.0 * x + 3.0) / 6.0))


def _make(fwd_kernel, bwd_kernel):
    @jax.custom_vjp
    def op(x):
        return _elementwise(fwd_kernel, x)

    def fwd(x):
        return op(x), x

    def bwd(x, g):
        return (g * _elementwise(bwd_kernel, x),)

    op.defvjp(fwd, bwd)
    return op


mish_pallas = _make(_mish_fwd_kernel, _mish_bwd_kernel)
swish_pallas = _make(_swish_fwd_kernel, _swish_bwd_kernel)
hswish_pallas = _make(_hswish_fwd_kernel, _hswish_bwd_kernel)
