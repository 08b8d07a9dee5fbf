"""Segmentation metrics, fully jit-compatible (no host syncs inside the
step — the reference calls `.item()` per batch, train_bce_dice.py:337).

All functions take NHWC logits [B,H,W,1] and targets [B,H,W,1] in
{0,1} float, reduce over the spatial+channel axes per sample, then mean
over the batch — matching the reference reductions over (2,3) in NCHW
(train_bce_dice.py:201-212, train_with_pretrained.py:218-256,
finetune_for_224.py:224-232).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

_SPATIAL = (1, 2, 3)  # H, W, C of NHWC


def _f32(x):
    return x.astype(jnp.float32)


def soft_dice(logits, targets, smooth: float = 1.0, eps: float = 1e-7):
    """Soft (probability) Dice, reference `dice_metric`
    (train_bce_dice.py:201-206)."""
    probs = jax.nn.sigmoid(_f32(logits))
    targets = _f32(targets)
    inter = jnp.sum(probs * targets, _SPATIAL)
    denom = jnp.sum(probs, _SPATIAL) + jnp.sum(targets, _SPATIAL)
    dice = (2.0 * inter + smooth) / (denom + smooth + eps)
    return jnp.mean(dice)


def iou_at(logits, targets, t: float = 0.5, eps: float = 1e-7):
    """Binarized IoU at threshold t (train_bce_dice.py:208-212)."""
    preds = (jax.nn.sigmoid(_f32(logits)) > t).astype(jnp.float32)
    targets = _f32(targets)
    inter = jnp.sum(preds * targets, _SPATIAL)
    union = jnp.sum(preds, _SPATIAL) + jnp.sum(targets, _SPATIAL) - inter
    return jnp.mean((inter + eps) / (union + eps))


def dice_iou_at(logits, targets, t: float = 0.5, eps: float = 1e-7):
    """Binarized (Dice, IoU) at threshold t — reference `dice_iou_at_t`
    (finetune_for_224.py:224-232)."""
    preds = (jax.nn.sigmoid(_f32(logits)) > t).astype(jnp.float32)
    targets = _f32(targets)
    inter = jnp.sum(preds * targets, _SPATIAL)
    den = jnp.sum(preds, _SPATIAL) + jnp.sum(targets, _SPATIAL)
    union = den - inter
    dice = (2.0 * inter + eps) / (den + eps)
    iou = (inter + eps) / (union + eps)
    return jnp.mean(dice), jnp.mean(iou)


def binary_dice_at(logits, targets, t: float, smooth: float = 1.0):
    """Binarized Dice with +smooth numerator/denominator as used by the
    reference threshold search (train_bce_dice.py:224-227)."""
    preds = (jax.nn.sigmoid(_f32(logits)) > t).astype(jnp.float32)
    targets = _f32(targets)
    inter = jnp.sum(preds * targets, _SPATIAL)
    denom = jnp.sum(preds, _SPATIAL) + jnp.sum(targets, _SPATIAL)
    return jnp.mean((2.0 * inter + smooth) / (denom + smooth))


def precision_recall_f1(logits, targets, t: float = 0.5, eps: float = 1e-7):
    """Pixel precision / recall / F1 at threshold t
    (train_with_pretrained.py:218-236)."""
    preds = (jax.nn.sigmoid(_f32(logits)) > t).astype(jnp.float32)
    targets = _f32(targets)
    tp = jnp.sum(preds * targets, _SPATIAL)
    fp = jnp.sum(preds * (1.0 - targets), _SPATIAL)
    fn = jnp.sum((1.0 - preds) * targets, _SPATIAL)
    precision = (tp + eps) / (tp + fp + eps)
    recall = (tp + eps) / (tp + fn + eps)
    f1 = 2.0 * precision * recall / (precision + recall + eps)
    return jnp.mean(precision), jnp.mean(recall), jnp.mean(f1)


def eval_suite_per_sample(logits, targets, t: float = 0.5,
                          smooth: float = 1.0,
                          eps: float = 1e-7) -> Dict[str, jnp.ndarray]:
    """Every validation metric as a per-sample [B] vector (one fused
    jit region; the batch reductions of eval_suite / eval_suite_sums
    are taken over these)."""
    probs = jax.nn.sigmoid(_f32(logits))
    targets = _f32(targets)
    preds = (probs > t).astype(jnp.float32)

    inter_soft = jnp.sum(probs * targets, _SPATIAL)
    den_soft = jnp.sum(probs, _SPATIAL) + jnp.sum(targets, _SPATIAL)
    dice = (2.0 * inter_soft + smooth) / (den_soft + smooth + eps)

    tp = jnp.sum(preds * targets, _SPATIAL)
    fp = jnp.sum(preds * (1.0 - targets), _SPATIAL)
    fn = jnp.sum((1.0 - preds) * targets, _SPATIAL)
    union = tp + fp + fn
    iou = (tp + eps) / (union + eps)
    dice_b = (2.0 * tp + eps) / (2.0 * tp + fp + fn + eps)
    precision = (tp + eps) / (tp + fp + eps)
    recall = (tp + eps) / (tp + fn + eps)
    f1 = 2.0 * precision * recall / (precision + recall + eps)
    return {
        "dice": dice, "iou": iou, "dice_bin": dice_b, "iou_bin": iou,
        "precision": precision, "recall": recall, "f1": f1,
    }


def eval_suite(logits, targets, t: float = 0.5) -> Dict[str, jnp.ndarray]:
    """All per-batch validation metrics in one fused jit region."""
    per = eval_suite_per_sample(logits, targets, t)
    return {k: jnp.mean(v) for k, v in per.items()}


def eval_suite_sums(logits, targets, w, t: float = 0.5
                    ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Weighted SUMS of the per-sample metrics plus the weight total —
    the exact-mean validation aggregation: the caller accumulates sums
    across batches and divides once, so cycle-padded tail samples
    (weight 0) contribute nothing (replaces the reference-style
    mean-of-batch-means overweighting)."""
    per = eval_suite_per_sample(logits, targets, t)
    w = _f32(w)
    return {k: jnp.sum(v * w) for k, v in per.items()}, jnp.sum(w)


def threshold_sweep_stats(logits, targets, thresholds) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Binarized (dice, iou) per threshold for a batch, vectorized over
    the threshold axis on device.

    The reference re-infers the entire val set once *per threshold*
    (train_bce_dice.py:214-232 does 13 full passes); here the model
    forward runs once and the sweep is a vmapped thresholding — a pure
    algorithmic win on top of the hardware one.

    Returns arrays of shape [T] each (mean over the batch).
    """
    probs = jax.nn.sigmoid(_f32(logits))
    targets = _f32(targets)

    def at(t):
        preds = (probs > t).astype(jnp.float32)
        inter = jnp.sum(preds * targets, _SPATIAL)
        den = jnp.sum(preds, _SPATIAL) + jnp.sum(targets, _SPATIAL)
        union = den - inter
        eps = 1e-7
        dice = (2.0 * inter + eps) / (den + eps)
        iou = (inter + eps) / (union + eps)
        return jnp.mean(dice), jnp.mean(iou)

    return jax.vmap(at)(jnp.asarray(thresholds, jnp.float32))


def threshold_sweep_sums(logits, targets, thresholds, w
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Weighted-sum variant of threshold_sweep_stats: returns
    (dice_sums [T], iou_sums [T], n) so the caller's cross-batch
    aggregation is an exact mean (cycle-padded tail samples carry w=0)."""
    probs = jax.nn.sigmoid(_f32(logits))
    targets = _f32(targets)
    w = _f32(w)

    def at(t):
        preds = (probs > t).astype(jnp.float32)
        inter = jnp.sum(preds * targets, _SPATIAL)
        den = jnp.sum(preds, _SPATIAL) + jnp.sum(targets, _SPATIAL)
        union = den - inter
        eps = 1e-7
        dice = (2.0 * inter + eps) / (den + eps)
        iou = (inter + eps) / (union + eps)
        return jnp.sum(dice * w), jnp.sum(iou * w)

    d, i = jax.vmap(at)(jnp.asarray(thresholds, jnp.float32))
    return d, i, jnp.sum(w)


def threshold_sweep_dice_smooth(logits, targets, thresholds) -> jnp.ndarray:
    """Per-threshold smoothed binarized dice matching
    `find_best_threshold` math (train_bce_dice.py:214-232). [T]."""
    probs = jax.nn.sigmoid(_f32(logits))
    targets = _f32(targets)

    def at(t):
        preds = (probs > t).astype(jnp.float32)
        inter = jnp.sum(preds * targets, _SPATIAL)
        denom = jnp.sum(preds, _SPATIAL) + jnp.sum(targets, _SPATIAL)
        return jnp.mean((2.0 * inter + 1.0) / (denom + 1.0))

    return jax.vmap(at)(jnp.asarray(thresholds, jnp.float32))
