"""Per-channel (sum a, sum a*b) over an NHWC batch — the BatchNorm
statistic/gradient reductions.

Why a kernel: XLA's reduce of a low-channel NHWC tensor (C=16/32 at
512^2, the UNet decoder's top stages) picks a lane-padded layout (16 or
32 channels padded to 128 lanes) and runs at ~37 GB/s effective — the
BN stat+grad reduces alone cost ~53 ms of the 129 ms 512^2 train step
(docs/step_trace.json). Viewing the SAME bytes as [B*H, W*C] makes the
minor axis a multiple of 128 lanes (W*C), so the reduction reads
compact full-width rows at HBM bandwidth; a trivial [W, C] -> [C] XLA
tail finishes the channel sums.

One kernel serves both BN passes:
  forward stats: a = x, b = x      -> (sum x, sum x^2)
  backward sums: a = dy, b = x     -> (sum dy, sum dy*x)
(sum dy*xhat is derived outside: rstd * (sum dy*x - mean * sum dy).)

Mosaic notes (CLAUDE.md): rank-2 blocks, one reduction axis at a time,
accumulate across grid steps into an (8, N)-padded VMEM output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cartseg_tpu.ops.pallas.common import interpret_mode, cdiv

_LANES = 128
# per-input VMEM budget for a block (bytes); two inputs, each
# double-buffered by the pipeline, + f32 accums must fit 16M scoped VMEM
_BLOCK_BYTES = 2 * 1024 * 1024


def _sums_kernel(a_ref, b_ref, sa_ref, sab_ref):
    i = pl.program_id(0)
    a = a_ref[:].astype(jnp.float32)          # [TM, N]
    b = b_ref[:].astype(jnp.float32)
    sa = jnp.sum(a, axis=0, keepdims=True)    # [1, N]
    sab = jnp.sum(a * b, axis=0, keepdims=True)
    rows = jax.lax.broadcasted_iota(jnp.int32, sa_ref.shape, 0)
    sa_full = jnp.where(rows == 0, sa, 0.0)
    sab_full = jnp.where(rows == 0, sab, 0.0)

    @pl.when(i == 0)
    def _():
        sa_ref[:] = jnp.zeros_like(sa_ref)
        sab_ref[:] = jnp.zeros_like(sab_ref)

    sa_ref[:] += sa_full
    sab_ref[:] += sab_full


def supported(shape) -> bool:
    """True when the [B,H,W,C] shape maps onto the compact rank-2 view
    the kernel needs (minor axis a lane multiple, rows a sublane
    multiple)."""
    if len(shape) != 4:
        return False
    B, H, W, C = shape
    return (W * C) % _LANES == 0 and (B * H) % 8 == 0 and B * H >= 8


def channel_sums_pallas(a, b):
    """a, b: [B,H,W,C] (same shape; bf16/f32) -> (sum a, sum a*b) per
    channel, f32 [C] each. Reduction over B,H,W in f32."""
    B, H, W, C = a.shape
    M, N = B * H, W * C
    a2 = a.reshape(M, N)
    b2 = b.reshape(M, N)
    bytes_per_row = N * max(a2.dtype.itemsize, b2.dtype.itemsize)
    tm = max(8, min(M, (_BLOCK_BYTES // bytes_per_row) // 8 * 8))
    while M % tm:
        tm -= 8
    grid = (M // tm,)
    sa, sab = pl.pallas_call(
        _sums_kernel,
        out_shape=(jax.ShapeDtypeStruct((8, N), jnp.float32),
                   jax.ShapeDtypeStruct((8, N), jnp.float32)),
        grid=grid,
        in_specs=[pl.BlockSpec((tm, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tm, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((8, N), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, N), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret_mode(),
    )(a2, b2)
    sa_c = jnp.sum(sa[0].reshape(W, C), axis=0)
    sab_c = jnp.sum(sab[0].reshape(W, C), axis=0)
    return sa_c, sab_c


def channel_sums_xla(a, b):
    """Oracle / fallback lane: same contraction in plain XLA."""
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    return (jnp.sum(af, axis=(0, 1, 2)),
            jnp.sum(af * bf, axis=(0, 1, 2)))


def channel_sums(a, b):
    """(sum a, sum a*b) per channel; Pallas on supported shapes, XLA
    otherwise (interpret mode covers CPU tests either way)."""
    if supported(a.shape):
        return channel_sums_pallas(a, b)
    return channel_sums_xla(a, b)
