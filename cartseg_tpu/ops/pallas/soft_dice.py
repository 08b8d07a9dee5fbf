"""Batch soft-Dice Pallas kernel — soft_dice_kernel_v2.cu equivalent:
per-sample reduction of numer = sum 2*p*y and denor = sum p^pexp + y
(the CUDA two-stage block reduction becomes a grid-accumulated VMEM
reduction), then loss_b = 1 - (numer+s)/(denor+s); analytic backward.

Mosaic layout: samples on the sublane axis. Inputs reshape to
[B, R, 128]; the grid walks R in stripes with an all-samples block
(B, R_TILE, 128); per-sample partials accumulate into a (B_pad, 128)
VMEM output (lane 0 carries the value) across grid steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cartseg_tpu.ops.pallas.common import interpret_mode, cdiv, round_up

_LANES = 128
_R_TILE = 32  # rows of 128 lanes per grid step per sample


def _reduce_kernel(x_ref, y_ref, numer_ref, denor_ref, *, p):
    # Mosaic constraints: rank>=2 everywhere, sublane-axis reductions
    # one axis at a time (a fused axis=(1,2) sum SIGABRTs the compiler),
    # and B pre-padded to a full sublane (8) by the caller.
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)   # [B8, R_TILE, LANES]
    y = y_ref[:].astype(jnp.float32)
    prob = 1.0 / (1.0 + jnp.exp(-x))
    n2 = jnp.sum(2.0 * prob * y, axis=1, keepdims=True)   # [B8,1,L]
    d2 = jnp.sum(prob ** p + y, axis=1, keepdims=True)
    numer = jnp.sum(n2[:, 0, :], axis=1, keepdims=True)   # [B8,1]
    denor = jnp.sum(d2[:, 0, :], axis=1, keepdims=True)
    cols = jax.lax.broadcasted_iota(jnp.int32, numer_ref.shape, 1)
    numer_full = jnp.where(cols == 0, numer, 0.0)
    denor_full = jnp.where(cols == 0, denor, 0.0)

    @pl.when(i == 0)
    def _():
        numer_ref[:] = jnp.zeros_like(numer_ref)
        denor_ref[:] = jnp.zeros_like(denor_ref)

    numer_ref[:] += numer_full
    denor_ref[:] += denor_full


def _reduce(logits, labels, p):
    B = logits.shape[0]
    B_pad = round_up(B, 8)
    x = jnp.asarray(logits, jnp.float32).reshape(B, -1)
    y = jnp.asarray(labels, jnp.float32).reshape(B, -1)
    M = x.shape[1]
    per = _R_TILE * _LANES
    m_pad = cdiv(M, per) * per - M
    # pad with -inf logits (prob 0) and zero labels: contributes 0;
    # batch padded to a full sublane for Mosaic
    x = jnp.pad(x, ((0, B_pad - B), (0, m_pad)), constant_values=-1e30)
    y = jnp.pad(y, ((0, B_pad - B), (0, m_pad)))
    R = x.shape[1] // _LANES
    x3 = x.reshape(B_pad, R, _LANES)
    y3 = y.reshape(B_pad, R, _LANES)
    tiles = R // _R_TILE
    numer, denor = pl.pallas_call(
        functools.partial(_reduce_kernel, p=p),
        out_shape=(jax.ShapeDtypeStruct((B_pad, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((B_pad, _LANES), jnp.float32)),
        grid=(tiles,),
        in_specs=[pl.BlockSpec((B_pad, _R_TILE, _LANES),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((B_pad, _R_TILE, _LANES),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((B_pad, _LANES), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((B_pad, _LANES), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret_mode(),
    )(x3, y3)
    return numer[:B, 0], denor[:B, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def soft_dice_pallas(logits, labels, p: float = 1.0, smooth: float = 1.0):
    """Per-sample soft dice loss [B], CUDA v2 semantics."""
    numer, denor = _reduce(logits, labels, p)
    return 1.0 - (numer + smooth) / (denor + smooth)


def _fwd(logits, labels, p, smooth):
    numer, denor = _reduce(logits, labels, p)
    loss = 1.0 - (numer + smooth) / (denor + smooth)
    return loss, (logits, labels, numer, denor)


def _bwd(p, smooth, res, g):
    logits, labels, numer, denor = res
    B = logits.shape[0]
    x = jnp.asarray(logits, jnp.float32)
    y = jnp.asarray(labels, jnp.float32)
    bshape = (B,) + (1,) * (x.ndim - 1)
    N = (numer + smooth).reshape(bshape)
    D = (denor + smooth).reshape(bshape)
    prob = jax.nn.sigmoid(x)
    dprob = prob * (1.0 - prob)
    # d loss / d prob = -(2y*D - N*p*prob^(p-1)) / D^2
    dl_dprob = -(2.0 * y * D - N * p * prob ** (p - 1.0)) / (D * D)
    grad = dl_dprob * dprob * jnp.asarray(g, jnp.float32).reshape(bshape)
    return grad.astype(logits.dtype), None


soft_dice_pallas.defvjp(_fwd, _bwd)
