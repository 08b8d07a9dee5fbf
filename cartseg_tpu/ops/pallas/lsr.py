"""Fused label-smoothed softmax CE as a Pallas TPU kernel — the
equivalent of lsr_kernel.cu (the one CUDA extension the reference
builds, abl_training/setup.py:13).

Semantics (= cartseg_tpu.losses.lsr_cross_entropy, the Tier-A oracle):
  loss_i = -sum_c oh_ic * log_softmax(x_i)_c,  oh = smoothed one-hot,
  ignored rows -> 0.

Fusion wins over the unfused XLA chain:
  * the smoothed one-hot never exists in HBM — it is two scalars
    (lb_pos/lb_neg) plus an iota==label compare inside VMEM
    (lsr_kernel.cu builds it implicitly the same way, :66-111)
  * the backward reads only (logits, labels) residuals and emits
    grad = g * (coeff*softmax - oh) in one pass (:115-145); no
    softmax/one-hot saved between passes.

Mosaic layout: positions live on the LANE axis. Logits are transposed
to [C, N] so a block is (C, TILE) — sublane = C (2 or 8 for this
framework's losses), lane = TILE (1024); the class-axis reductions are
cheap sublane reductions. Labels/loss/grad-out ride as (1, TILE) rows
(Mosaic rejects 1-D vectors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cartseg_tpu.ops.pallas.common import interpret_mode, cdiv

_TILE = 1024


def _fwd_kernel(logits_ref, labels_ref, loss_ref, *, lb_smooth,
                ignore_index):
    x = logits_ref[:].astype(jnp.float32)      # [C, T]
    lab = labels_ref[:]                        # [1, T]
    C, T = x.shape
    lb_pos = 1.0 - lb_smooth
    lb_neg = lb_smooth / C

    m = jnp.max(x, axis=0, keepdims=True)
    z = x - m
    logsumexp = jnp.log(jnp.sum(jnp.exp(z), axis=0, keepdims=True))
    logp = z - logsumexp                       # [C, T]

    ignore = lab == ignore_index               # [1, T]
    safe = jnp.where(ignore, 0, lab)
    rows = jax.lax.broadcasted_iota(jnp.int32, (C, T), 0)
    is_lab = rows == safe                      # [C, T]
    loss = -(lb_neg * jnp.sum(logp, axis=0, keepdims=True)
             + (lb_pos - lb_neg) * jnp.sum(jnp.where(is_lab, logp, 0.0),
                                           axis=0, keepdims=True))
    loss_ref[:] = jnp.where(ignore, 0.0, loss)


def _bwd_kernel(logits_ref, labels_ref, g_ref, grad_ref, *, lb_smooth,
                ignore_index):
    x = logits_ref[:].astype(jnp.float32)      # [C, T]
    lab = labels_ref[:]                        # [1, T]
    g = g_ref[:]                               # [1, T]
    C, T = x.shape
    lb_pos = 1.0 - lb_smooth
    lb_neg = lb_smooth / C
    coeff = (C - 1) * lb_neg + lb_pos

    m = jnp.max(x, axis=0, keepdims=True)
    e = jnp.exp(x - m)
    p = e / jnp.sum(e, axis=0, keepdims=True)

    ignore = lab == ignore_index
    safe = jnp.where(ignore, 0, lab)
    rows = jax.lax.broadcasted_iota(jnp.int32, (C, T), 0)
    oh = jnp.where(rows == safe, lb_pos, lb_neg)
    grad = (coeff * p - oh) * g
    grad_ref[:] = jnp.where(ignore, 0.0, grad)


def _prep(logits, labels):
    """-> xT [C, Np], lab2 [1, Np], n (valid count)."""
    C = logits.shape[-1]
    x = jnp.asarray(logits, jnp.float32).reshape(-1, C)
    lab = jnp.asarray(labels, jnp.int32).reshape(-1)
    n = x.shape[0]
    n_pad = cdiv(n, _TILE) * _TILE - n
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0)))
        # pad labels with the ignore marker via class 0 + mask later;
        # padded loss rows are sliced off anyway
        lab = jnp.pad(lab, (0, n_pad))
    return x.T, lab[None, :], n


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def lsr_ce_pallas(logits, labels, lb_smooth: float = 0.1,
                  ignore_index: int = -100):
    """Per-position LSR CE [...] (unreduced). logits [..., C]."""
    return _forward(logits, labels, lb_smooth, ignore_index)


def _forward(logits, labels, lb_smooth, ignore_index):
    shape = labels.shape
    C = logits.shape[-1]
    xT, lab2, n = _prep(logits, labels)
    grid = (xT.shape[1] // _TILE,)
    loss = pl.pallas_call(
        functools.partial(_fwd_kernel, lb_smooth=lb_smooth,
                          ignore_index=ignore_index),
        out_shape=jax.ShapeDtypeStruct((1, xT.shape[1]), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((C, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
    )(xT, lab2)
    return loss[0, :n].reshape(shape)


def _fwd_rule(logits, labels, lb_smooth, ignore_index):
    return (_forward(logits, labels, lb_smooth, ignore_index),
            (logits, labels))


def _bwd_rule(lb_smooth, ignore_index, res, g):
    logits, labels = res
    shape = logits.shape
    C = shape[-1]
    xT, lab2, n = _prep(logits, labels)
    gf = jnp.asarray(g, jnp.float32).reshape(-1)
    if gf.shape[0] != xT.shape[1]:
        gf = jnp.pad(gf, (0, xT.shape[1] - gf.shape[0]))
    grid = (xT.shape[1] // _TILE,)
    gradT = pl.pallas_call(
        functools.partial(_bwd_kernel, lb_smooth=lb_smooth,
                          ignore_index=ignore_index),
        out_shape=jax.ShapeDtypeStruct(xT.shape, jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((C, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, _TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
    )(xT, lab2, gf[None, :])
    return gradT.T[:n].reshape(shape).astype(logits.dtype), None


lsr_ce_pallas.defvjp(_fwd_rule, _bwd_rule)
