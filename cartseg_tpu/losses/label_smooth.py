"""Label-smoothed softmax cross-entropy, the reference's most-tiered op:
V1 autograd (losses/label_smooth.py:14-54), V2 hand-derived grads
(:60-121), V3 CUDA (`lsr_kernel.cu`). Here:

  * :func:`smooth_one_hot`        — `label_one_hot` (one_hot_kernel.cu:194-330)
  * :func:`lsr_cross_entropy`     — V1 math, jnp autodiff (the oracle)
  * :func:`lsr_cross_entropy_fused` — custom_vjp with the V2/CUDA
    backward `grad = coeff*softmax - smoothed_onehot`
    (label_smooth.py:89-95, lsr_kernel.cu:115-145); saves the logits
    only (no smoothed one-hot residual), same memory win the CUDA
    kernel targets.

Layout: channels-last. logits [..., C], labels [...] int32/64. The
reference is NCHW; NHWC is the TPU-native layout and the math is
axis-transparent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_one_hot(labels, num_classes: int, lb_smooth: float = 0.1,
                   ignore_index: int = -100):
    """Label -> smoothed one-hot over the last axis; ignored positions
    become all-zero rows (one_hot_kernel.cu ignore handling)."""
    labels = jnp.asarray(labels)
    ignore = labels == ignore_index
    safe = jnp.where(ignore, 0, labels)
    lb_pos = 1.0 - lb_smooth
    lb_neg = lb_smooth / num_classes
    oh = jax.nn.one_hot(safe, num_classes, dtype=jnp.float32)
    oh = oh * (lb_pos - lb_neg) + lb_neg
    return jnp.where(ignore[..., None], 0.0, oh)


def _lsr_forward(logits, labels, lb_smooth, ignore_index):
    logits = jnp.asarray(logits, jnp.float32)  # fp32 to avoid nan (V1 :35)
    num_classes = logits.shape[-1]
    ignore = labels == ignore_index
    lb_one_hot = smooth_one_hot(labels, num_classes, lb_smooth, ignore_index)
    logs = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.sum(logs * lb_one_hot, axis=-1)
    return jnp.where(ignore, 0.0, loss), ignore


def lsr_cross_entropy(logits, labels, lb_smooth: float = 0.1,
                      reduction: str = "mean", ignore_index: int = -100):
    """V1 math (autograd oracle). reduction 'mean' divides by the count
    of non-ignored positions, exactly as the reference."""
    loss, ignore = _lsr_forward(logits, labels, lb_smooth, ignore_index)
    if reduction == "mean":
        n_valid = jnp.maximum(jnp.sum(~ignore), 1)
        return jnp.sum(loss) / n_valid
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


@jax.custom_vjp
def lsr_cross_entropy_fused(logits, labels, lb_smooth: float = 0.1,
                            ignore_index: int = -100):
    """Unreduced LSR CE with the hand-derived V2 backward. Returns the
    per-position loss [...]; wrap with mean/sum as needed."""
    loss, _ = _lsr_forward(logits, labels, lb_smooth, ignore_index)
    return loss


def _fused_fwd(logits, labels, lb_smooth, ignore_index):
    loss, _ = _lsr_forward(logits, labels, lb_smooth, ignore_index)
    return loss, (logits, labels, lb_smooth, ignore_index)


def _fused_bwd(res, g):
    logits, labels, lb_smooth, ignore_index = res
    logits = jnp.asarray(logits, jnp.float32)
    num_classes = logits.shape[-1]
    lb_pos = 1.0 - lb_smooth
    lb_neg = lb_smooth / num_classes
    coeff = (num_classes - 1) * lb_neg + lb_pos
    lb_one_hot = smooth_one_hot(labels, num_classes, lb_smooth, ignore_index)
    scores = jax.nn.softmax(logits, axis=-1) * coeff
    grad = (scores - lb_one_hot) * g[..., None]
    ignore = (labels == ignore_index)[..., None]
    grad = jnp.where(ignore, 0.0, grad)
    return (grad, None, None, None)


lsr_cross_entropy_fused.defvjp(_fused_fwd, _fused_bwd)
