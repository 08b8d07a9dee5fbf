"""Taylor softmax (taylor_softmax.cu:14-23, 46-95): softmax with exp
replaced by the order-n Taylor polynomial t(x) = sum_{i<=n} x^i / i!.
Even n keeps t(x) > 0 for all x. Channels-last."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _taylor_series(x, n: int):
    res = 1.0 + x
    mid = x
    denor = 1.0
    for i in range(2, n + 1):
        denor = denor * i
        mid = mid * x
        res = res + mid / denor
    return res


def taylor_softmax(x, n: int = 2, axis: int = -1):
    t = _taylor_series(jnp.asarray(x, jnp.float32), n)
    return t / jnp.sum(t, axis=axis, keepdims=True)


def log_taylor_softmax(x, n: int = 2, axis: int = -1):
    t = _taylor_series(jnp.asarray(x, jnp.float32), n)
    return jnp.log(t) - jnp.log(jnp.sum(t, axis=axis, keepdims=True))


def taylor_cross_entropy(logits, labels, n: int = 2, lb_smooth: float = 0.0,
                         ignore_index: int = -100, reduction: str = "mean"):
    """CE over taylor-softmax activations with optional label smoothing
    (the reference pairs taylor_softmax with its LSR CE)."""
    from cartseg_tpu.losses.label_smooth import smooth_one_hot

    num_classes = logits.shape[-1]
    logs = log_taylor_softmax(logits, n=n, axis=-1)
    oh = smooth_one_hot(labels, num_classes, lb_smooth, ignore_index) \
        if lb_smooth > 0 else jnp.where(
            (labels == ignore_index)[..., None], 0.0,
            jax.nn.one_hot(jnp.where(labels == ignore_index, 0, labels),
                           num_classes, dtype=jnp.float32))
    loss = -jnp.sum(logs * oh, axis=-1)
    ignore = labels == ignore_index
    loss = jnp.where(ignore, 0.0, loss)
    if reduction == "mean":
        return jnp.sum(loss) / jnp.maximum(jnp.sum(~ignore), 1)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss
