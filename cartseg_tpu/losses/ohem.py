"""Online hard example mining relabeling (ohem_label_kernel.cu:120-174):
compute the softmax probability of each position's true class, keep the
n_min hardest (lowest-score) positions unconditionally, and set every
other position whose score exceeds score_thresh to ignore_index.

TPU formulation: a full sort over the flattened score vector replaces
the thrust segmented sort — `jax.lax.sort` keeps everything static-
shaped and on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ohem_labels(logits, labels, score_thresh: float = 0.7,
                n_min: int = 16, ignore_index: int = 255):
    """logits [..., C] channels-last, labels [...] int. Returns
    relabeled int labels of the same shape."""
    labels = jnp.asarray(labels)
    shape = labels.shape
    flat_labels = labels.reshape(-1)
    flat_logits = jnp.asarray(logits, jnp.float32).reshape(-1, logits.shape[-1])

    ignore = flat_labels == ignore_index
    safe = jnp.where(ignore, 0, flat_labels)
    probs = jax.nn.softmax(flat_logits, axis=-1)
    scores = jnp.take_along_axis(probs, safe[:, None], axis=-1)[:, 0]
    # ignored positions score 1.0 so they sort last (kernel :131-132)
    scores = jnp.where(ignore, 1.0, scores)

    if n_min >= flat_labels.shape[0]:
        return labels

    order = jnp.argsort(scores)  # ascending: hardest first
    rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    drop = (rank >= n_min) & (scores > score_thresh)
    out = jnp.where(drop, ignore_index, flat_labels)
    return out.reshape(shape)
