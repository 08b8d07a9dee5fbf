"""Lovász losses (lovasz_softmax.cu:380-470, 799-801) — the hardest
reference kernel to port: per-image per-class descending sort of errors
+ cumulative-sum Jaccard gradient.

TPU formulation: `jnp.argsort` (XLA's on-device sort) + `jnp.cumsum`
replace the thrust segmented sort + Blelloch scan (cumsum.hpp); the
whole loss stays static-shaped, so `jax.grad` differentiates straight
through the sort permutation — the same gradient the CUDA backward
computes by redistributing the Jaccard deltas.

Ignored pixels are handled masked-dense: their error is zeroed and
their fg bit cleared, which sorts them to the tail where a zero error
annihilates their Jaccard-delta contribution (prefix sums at earlier
ranks are unaffected).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _lovasz_grad(fg_sorted):
    """Gradient of the Lovász extension w.r.t. sorted errors."""
    gts = jnp.sum(fg_sorted)
    cs = jnp.cumsum(fg_sorted)
    intersection = gts - cs
    union = gts + jnp.cumsum(1.0 - fg_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def _lovasz_softmax_image(probs, labels, valid, classes):
    """probs [P,C], labels [P], valid [P] -> mean loss over classes
    present in this image (classes==\"present\") or all classes."""
    C = probs.shape[-1]

    def per_class(c):
        fg = ((labels == c) & valid).astype(jnp.float32)
        errors = jnp.abs(fg - probs[:, c]) * valid.astype(jnp.float32)
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        fg_sorted = fg[order]
        loss_c = jnp.dot(errors_sorted, _lovasz_grad(fg_sorted))
        present = jnp.sum(fg) > 0
        return loss_c, present

    losses, present = jax.vmap(per_class)(jnp.arange(C))
    if classes == "present":
        w = present.astype(jnp.float32)
        return jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(losses)


def lovasz_softmax(logits, labels, classes: str = "present",
                   per_image: bool = True, ignore_index: int = -100):
    """logits [B,...,C] channels-last, labels [B,...] int.

    per_image=True matches the CUDA kernel (it always segments per
    image); per_image=False flattens the batch first.
    """
    logits = jnp.asarray(logits, jnp.float32)
    B, C = logits.shape[0], logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1).reshape(B, -1, C)
    labels = jnp.asarray(labels).reshape(B, -1)
    valid = labels != ignore_index

    if per_image:
        f = lambda p, l, v: _lovasz_softmax_image(p, l, v, classes)
        return jnp.mean(jax.vmap(f)(probs, labels, valid))
    return _lovasz_softmax_image(
        probs.reshape(-1, C), labels.reshape(-1), valid.reshape(-1), classes)


def lovasz_hinge(logits, labels, per_image: bool = True,
                 ignore_index: int = -100):
    """Binary Lovász hinge. logits [B,...] (squeeze any channel dim of 1
    first), labels [B,...] in {0,1}."""
    logits = jnp.asarray(logits, jnp.float32)
    B = logits.shape[0]
    lg = logits.reshape(B, -1)
    lb = jnp.asarray(labels).reshape(B, -1)
    valid = lb != ignore_index

    def per_img(lgi, lbi, vi):
        fg = (lbi > 0).astype(jnp.float32) * vi
        signs = 2.0 * fg - 1.0
        errors = (1.0 - lgi * signs) * vi
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        fg_sorted = fg[order]
        grad = _lovasz_grad(fg_sorted)
        return jnp.dot(jax.nn.relu(errors_sorted), grad)

    vi = valid.astype(jnp.float32)
    if per_image:
        return jnp.mean(jax.vmap(per_img)(lg, lb, vi))
    return per_img(lg.reshape(-1), lb.reshape(-1), vi.reshape(-1))
