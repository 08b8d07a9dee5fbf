"""Region losses: BCE+Dice (the reference's workhorse), focal variants,
and batch soft-Dice with the CUDA-kernel semantics.

All binary losses take NHWC logits/targets of shape [B,H,W,1] (floats,
targets in {0,1}); reductions follow the exact reference math:
  * bce_dice_loss        — train_bce_dice.py:186-199
  * bce_dice_per_sample  — finetune_for_224.py:208-221 (note the
                           denominator is sum(p)+sum(y), written there
                           as (probs+targets).sum())
  * focal_loss           — src/train_with_focalDice.py:195-219 (script
                           variant: alpha applied uniformly)
  * focal_loss_kernel    — focal_kernel.cu:30-52 (CUDA variant:
                           -|y-p|^gamma * [y*a*log p + (1-y)(1-a)*log(1-p)])
  * focal_dice_loss      — src/train_with_focalDice.py:222-235
  * soft_dice_loss       — soft_dice_kernel_v2.cu:53-160 (per-sample
                           1 - (2*sum(p*y)+s)/(sum(p^pexp)+sum(y)+s))

Everything is elementwise + spatial reduce: XLA fuses each of these into
a single VPU pass on TPU, so the Tier-A forms are already near
speed-of-light for their HBM-bound profile.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_SPATIAL = (1, 2, 3)


def use_pallas_losses() -> bool:
    """Route soft_dice_loss / focal_loss_kernel (and ABL's direction
    CE) through their Tier-B Pallas kernels. On-chip measurements
    (docs/CHIP_PARITY.md, fwd+bwd at hot-path shapes): soft_dice 1.09x,
    focal 0.99x, lsr 0.87x vs the fused XLA forms — within noise of an
    HBM-bound profile, so the default stays XLA; the flag exists to
    flip per-deployment (the reference runs its one built kernel in
    training, label_smooth.py:125-178 — here both lanes are wired and
    parity-tested either way)."""
    return (os.environ.get("CARTSEG_PALLAS_LOSSES", "0") == "1"
            and jax.default_backend() == "tpu")


def _f32(x):
    return jnp.asarray(x, jnp.float32)


def bce_with_logits(logits, targets, reduction: str = "mean"):
    """Numerically-stable binary cross entropy with logits
    (torch.nn.BCEWithLogitsLoss semantics)."""
    logits, targets = _f32(logits), _f32(targets)
    # max(x,0) - x*y + log(1+exp(-|x|))
    loss = (jnp.maximum(logits, 0.0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def _dice_term(probs, targets, smooth: float):
    inter = jnp.sum(probs * targets, _SPATIAL)
    denom = jnp.sum(probs, _SPATIAL) + jnp.sum(targets, _SPATIAL)
    return 1.0 - jnp.mean((2.0 * inter + smooth) / (denom + smooth))


def bce_dice_loss(logits, targets, bce_weight: float = 0.5, smooth: float = 1.0):
    """w*BCE + (1-w)*(1 - mean soft dice)."""
    logits, targets = _f32(logits), _f32(targets)
    bce = bce_with_logits(logits, targets)
    dice = _dice_term(jax.nn.sigmoid(logits), targets, smooth)
    return bce_weight * bce + (1.0 - bce_weight) * dice


def bce_dice_per_sample(logits, targets, bce_weight: float = 0.5, smooth: float = 1.0):
    """Per-sample [B] BCE+Dice for source-weighted mixed training."""
    logits, targets = _f32(logits), _f32(targets)
    bce = jnp.mean(bce_with_logits(logits, targets, reduction="none"), _SPATIAL)
    probs = jax.nn.sigmoid(logits)
    inter = jnp.sum(probs * targets, _SPATIAL)
    den = jnp.sum(probs + targets, _SPATIAL)
    dice = 1.0 - (2.0 * inter + smooth) / (den + smooth)
    return bce_weight * bce + (1.0 - bce_weight) * dice


def focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0,
               reduction: str = "mean"):
    """Script-variant focal loss: alpha * (1-pt)^gamma * BCE."""
    logits, targets = _f32(logits), _f32(targets)
    bce = bce_with_logits(logits, targets, reduction="none")
    probs = jax.nn.sigmoid(logits)
    pt = jnp.where(targets == 1.0, probs, 1.0 - probs)
    loss = alpha * (1.0 - pt) ** gamma * bce
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def focal_loss_kernel(logits, targets, gamma: float = 2.0,
                      alpha: float = 0.25):
    """Public dispatch: Pallas fused kernel under use_pallas_losses(),
    else the XLA custom-VJP form (identical semantics, parity-tested,
    docs/CHIP_PARITY.md fwd+bwd 0.99x)."""
    if use_pallas_losses():
        from cartseg_tpu.ops.pallas import focal_pallas
        return focal_pallas(_f32(logits), _f32(targets), gamma, alpha)
    return _focal_loss_kernel_xla(logits, targets, gamma, alpha)


@jax.custom_vjp
def _focal_loss_kernel_xla(logits, targets, gamma: float = 2.0,
                           alpha: float = 0.25):
    """CUDA-kernel focal variant with the hand-derived backward of
    focal_kernel.cu:55-90 mirrored as a custom VJP (the reference ships
    a fused fwd+bwd kernel; on TPU the VJP keeps the same one-pass
    recompute-in-backward memory profile instead of storing per-element
    residual products).

    Elementwise, no reduction (matches the kernel's `losses` output).
    """
    return _focal_kernel_fwd_math(logits, targets, gamma, alpha)


def _focal_kernel_fwd_math(logits, targets, gamma, alpha):
    logits, lb = _f32(logits), _f32(targets)
    prob = jax.nn.sigmoid(logits)
    log_p = -jax.nn.softplus(-logits)  # log sigmoid, stable both signs
    ce = lb * alpha * log_p + (1.0 - lb) * (1.0 - alpha) * (log_p - logits)
    coeff = -jnp.abs(lb - prob) ** gamma
    return coeff * ce


def _focal_kernel_fwd(logits, targets, gamma, alpha):
    out = _focal_kernel_fwd_math(logits, targets, gamma, alpha)
    return out, (logits, targets, gamma, alpha)


def _focal_kernel_bwd(res, g):
    logits, targets, gamma, alpha = res
    logits, lb = _f32(logits), _f32(targets)
    prob = jax.nn.sigmoid(logits)
    log_p = -jax.nn.softplus(-logits)
    ce = lb * alpha * log_p + (1.0 - lb) * (1.0 - alpha) * (log_p - logits)
    coeff = -jnp.abs(lb - prob) ** gamma
    d_ce = lb * alpha - prob * (1.0 - lb - alpha + 2.0 * lb * alpha)
    d_coeff = gamma * jnp.abs(lb - prob) ** (gamma - 1.0) * prob * (1.0 - prob)
    d_coeff = jnp.where(lb < prob, -d_coeff, d_coeff)
    grad = d_coeff * ce + coeff * d_ce
    return (g * grad, None, None, None)


_focal_loss_kernel_xla.defvjp(_focal_kernel_fwd, _focal_kernel_bwd)


def focal_dice_loss(logits, targets, alpha: float = 0.5, gamma: float = 2.0,
                    smooth: float = 1.0, w_focal: float = 0.5):
    """w*focal + (1-w)*dice, script semantics."""
    logits, targets = _f32(logits), _f32(targets)
    focal = focal_loss(logits, targets, alpha=alpha, gamma=gamma)
    dice = _dice_term(jax.nn.sigmoid(logits), targets, smooth)
    return w_focal * focal + (1.0 - w_focal) * dice


def soft_dice_loss(logits, labels, p: float = 1.0, smooth: float = 1.0):
    """Batch soft-Dice with the soft_dice_kernel_v2.cu semantics:
    per-sample numer = sum(2*sigmoid(x)*y), denor = sum(sigmoid(x)^p + y),
    loss_i = 1 - (numer+smooth)/(denor+smooth). Returns [B].

    Reductions over all non-batch axes (the CUDA kernel flattens each
    sample). Grads flow through jax autodiff — the analytic CUDA
    backward matches sigmoid-chain autodiff exactly.
    """
    logits = _f32(logits)
    labels = _f32(labels)
    if use_pallas_losses():
        from cartseg_tpu.ops.pallas import soft_dice_pallas
        return soft_dice_pallas(logits, labels, p, smooth)
    probs = jax.nn.sigmoid(logits)
    axes = tuple(range(1, logits.ndim))
    numer = jnp.sum(2.0 * probs * labels, axes)
    denor = jnp.sum(probs ** p + labels, axes)
    return 1.0 - (numer + smooth) / (denor + smooth)
