"""Activation ops from the reference CUDA zoo (mish_kernel.cu,
swish_kernel.cu), with custom VJPs mirroring the hand-derived
backwards (incl. mish's EXP_THRESH=20 overflow guard semantics, which
on TPU is the numerically-equivalent softplus-stable form)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def mish(x):
    """x * tanh(softplus(x)) — mish_kernel.cu:10-25."""
    return x * jnp.tanh(jax.nn.softplus(x))


def _mish_fwd(x):
    return mish(x), x


def _mish_bwd(x, g):
    sp = jax.nn.softplus(x)
    tsp = jnp.tanh(sp)
    # d/dx [x tanh(sp(x))] = tanh(sp) + x * sech^2(sp) * sigmoid(x)
    grad = tsp + x * (1.0 - tsp * tsp) * jax.nn.sigmoid(x)
    return (g * grad,)


mish.defvjp(_mish_fwd, _mish_bwd)


@jax.custom_vjp
def swish(x):
    """x * sigmoid(x) — swish_kernel.cu."""
    return x * jax.nn.sigmoid(x)


def _swish_fwd(x):
    return swish(x), x


def _swish_bwd(x, g):
    s = jax.nn.sigmoid(x)
    return (g * (s + x * s * (1.0 - s)),)


swish.defvjp(_swish_fwd, _swish_bwd)


@jax.custom_vjp
def hswish(x):
    """x * relu6(x+3)/6 — hswish in swish_kernel.cu:259-263."""
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _hswish_fwd(x):
    return hswish(x), x


def _hswish_bwd(x, g):
    grad = jnp.where(x <= -3.0, 0.0, jnp.where(x >= 3.0, 1.0, (2.0 * x + 3.0) / 6.0))
    return (g * grad,)


hswish.defvjp(_hswish_fwd, _hswish_bwd)
