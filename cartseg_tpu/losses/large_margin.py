"""Large-margin softmax CE (large_margin_kernel.cu:259-315):

  loss = CE(logits, y)
       + (lam/2) * sum_{j != y} (q_j - 1/(C-1)) * log(q_j)

where q = softmax over the non-target classes only. The CUDA kernel's
online max/sum reductions become two masked stable logsumexps — one
pass each on the VPU, fused by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e30


def large_margin_softmax(logits, labels, lam: float = 0.3,
                         ignore_index: int = -100, reduction: str = "mean"):
    """logits [..., C] channels-last, labels [...] int."""
    logits = jnp.asarray(logits, jnp.float32)
    C = logits.shape[-1]
    ignore = labels == ignore_index
    safe = jnp.where(ignore, 0, labels)
    oh = jax.nn.one_hot(safe, C, dtype=jnp.bool_)

    # standard CE over all classes
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]

    # q = softmax over non-target classes (mask target to -inf)
    masked = jnp.where(oh, _NEG, logits)
    logq = jax.nn.log_softmax(masked, axis=-1)
    q = jnp.exp(logq)
    term = (q - 1.0 / (C - 1)) * logq
    term = jnp.where(oh, 0.0, term)
    margin = (lam / 2.0) * jnp.sum(term, axis=-1)

    loss = jnp.where(ignore, 0.0, ce + margin)
    if reduction == "mean":
        return jnp.sum(loss) / jnp.maximum(jnp.sum(~ignore), 1)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss
