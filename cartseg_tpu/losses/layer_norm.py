"""LayerNorm fwd/bwd (layer_norm.cu:390-392 — part of the reference op
zoo, unused by its scripts). Custom VJP with the standard hand-derived
backward, matching the CUDA kernel's block mean/var reduction math.
Normalizes over the last axis (channels-last)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def layer_norm(x, weight, bias, eps: float = 1e-5):
    x32 = jnp.asarray(x, jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mean) ** 2, axis=-1, keepdims=True)
    xhat = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (xhat * weight + bias).astype(x.dtype)


def _ln_fwd(x, weight, bias, eps):
    x32 = jnp.asarray(x, jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mean) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mean) * rstd
    out = (xhat * weight + bias).astype(x.dtype)
    # zero-size token carries the primal dtype through the residuals
    # (dtypes themselves are not valid JAX residual types)
    token = jnp.zeros((0,), x.dtype)
    return out, (xhat, rstd, weight, token)


def _ln_bwd(res, g):
    xhat, rstd, weight, token = res
    dtype = token.dtype
    g = jnp.asarray(g, jnp.float32)
    N = xhat.shape[-1]
    gw = g * weight
    # dL/dx = rstd * (gw - mean(gw) - xhat * mean(gw * xhat))
    m1 = jnp.mean(gw, axis=-1, keepdims=True)
    m2 = jnp.mean(gw * xhat, axis=-1, keepdims=True)
    dx = (rstd * (gw - m1 - xhat * m2)).astype(dtype)
    axes = tuple(range(xhat.ndim - 1))
    dw = jnp.sum(g * xhat, axis=axes)
    db = jnp.sum(g, axis=axes)
    return dx, dw, db, None


layer_norm.defvjp(_ln_fwd, _ln_bwd)
