"""Fused sigmoid focal loss Pallas kernel — focal_kernel.cu equivalent,
including the fused forward+backward op (`focalloss_forward_backward`,
:337-340): one elementwise pass computes the loss AND the gradient
factor; backward is then a single multiply (no sigmoid/log recompute).

  loss = -|y - p|^g * (y a log p + (1-y)(1-a) (log p - x)),
  p = sigmoid(x)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cartseg_tpu.ops.pallas.common import interpret_mode, cdiv

_LANES = 128
_ROWS = 256


def _math(x, y, gamma, alpha):
    prob = 1.0 / (1.0 + jnp.exp(-x))
    log_p = jnp.where(x >= 0, -jnp.log1p(jnp.exp(-x)),
                      x - jnp.log1p(jnp.exp(x)))
    ce = y * alpha * log_p + (1.0 - y) * (1.0 - alpha) * (log_p - x)
    a = jnp.abs(y - prob)
    coeff = -(a ** gamma)
    loss = coeff * ce
    d_ce = y * alpha - prob * (1.0 - y - alpha + 2.0 * y * alpha)
    d_coeff = gamma * a ** (gamma - 1.0) * prob * (1.0 - prob)
    d_coeff = jnp.where(y < prob, -d_coeff, d_coeff)
    grad = d_coeff * ce + coeff * d_ce
    return loss, grad


def _fused_kernel(x_ref, y_ref, loss_ref, grad_ref, *, gamma, alpha):
    loss, grad = _math(x_ref[:].astype(jnp.float32),
                       y_ref[:].astype(jnp.float32), gamma, alpha)
    loss_ref[:] = loss
    grad_ref[:] = grad


def _run_fused(logits, targets, gamma, alpha):
    shape = logits.shape
    x = jnp.asarray(logits, jnp.float32).reshape(-1)
    y = jnp.asarray(targets, jnp.float32).reshape(-1)
    n = x.shape[0]
    per_tile = _ROWS * _LANES
    n_pad = cdiv(n, per_tile) * per_tile - n
    if n_pad:
        x = jnp.pad(x, (0, n_pad))
        y = jnp.pad(y, (0, n_pad))
    x2 = x.reshape(-1, _LANES)
    y2 = y.reshape(-1, _LANES)
    grid = (x2.shape[0] // _ROWS,)
    loss, grad = pl.pallas_call(
        functools.partial(_fused_kernel, gamma=gamma, alpha=alpha),
        out_shape=(jax.ShapeDtypeStruct(x2.shape, jnp.float32),
                   jax.ShapeDtypeStruct(x2.shape, jnp.float32)),
        grid=grid,
        in_specs=[pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret_mode(),
    )(x2, y2)
    return (loss.reshape(-1)[:n].reshape(shape),
            grad.reshape(-1)[:n].reshape(shape))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def focal_pallas(logits, targets, gamma: float = 2.0, alpha: float = 0.25):
    """Elementwise focal loss (unreduced), CUDA-kernel semantics."""
    loss, _ = _run_fused(logits, targets, gamma, alpha)
    return loss


def _fwd(logits, targets, gamma, alpha):
    loss, grad = _run_fused(logits, targets, gamma, alpha)
    # zero-size token carries the primal dtype (dtypes are not JAX types)
    return loss, (grad, jnp.zeros((0,), logits.dtype))


def _bwd(gamma, alpha, res, g):
    grad, token = res
    return ((g * grad).astype(token.dtype), None)


focal_pallas.defvjp(_fwd, _bwd)
