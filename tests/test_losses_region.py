"""Region-loss parity vs torch oracles implementing the reference math
(train_bce_dice.py:186-199, finetune_for_224.py:208-221,
src/train_with_focalDice.py:195-235, focal_kernel.cu:30-90,
soft_dice_kernel_v2.cu)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from cartseg_tpu import losses as L


def _rand(rng, b=3, h=24, w=24):
    logits = rng.normal(size=(b, h, w, 1)).astype(np.float32) * 2.5
    targets = (rng.random((b, h, w, 1)) > 0.5).astype(np.float32)
    return logits, targets


def _t(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def torch_bce_dice(logits, targets, w=0.5, smooth=1.0):
    bce = TF.binary_cross_entropy_with_logits(logits, targets)
    probs = torch.sigmoid(logits)
    inter = (probs * targets).sum((2, 3))
    denom = probs.sum((2, 3)) + targets.sum((2, 3))
    dice = 1 - ((2 * inter + smooth) / (denom + smooth)).mean()
    return (w * bce + (1 - w) * dice).item()


def test_bce_with_logits(rng):
    logits, targets = _rand(rng)
    ours = float(L.bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    ref = TF.binary_cross_entropy_with_logits(_t(logits), _t(targets)).item()
    assert ours == pytest.approx(ref, abs=1e-6)


def test_bce_dice(rng):
    logits, targets = _rand(rng)
    ours = float(L.bce_dice_loss(jnp.asarray(logits), jnp.asarray(targets)))
    assert ours == pytest.approx(torch_bce_dice(_t(logits), _t(targets)), abs=1e-5)


def test_bce_dice_per_sample(rng):
    logits, targets = _rand(rng)
    ours = np.asarray(L.bce_dice_per_sample(jnp.asarray(logits), jnp.asarray(targets)))
    tl, tt = _t(logits), _t(targets)
    bce = TF.binary_cross_entropy_with_logits(tl, tt, reduction="none").mean((1, 2, 3))
    probs = torch.sigmoid(tl)
    inter = (probs * tt).sum((1, 2, 3))
    den = (probs + tt).sum((1, 2, 3))
    dice = 1 - (2 * inter + 1.0) / (den + 1.0)
    ref = (0.5 * bce + 0.5 * dice).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_focal_script_variant(rng):
    logits, targets = _rand(rng)
    ours = float(L.focal_loss(jnp.asarray(logits), jnp.asarray(targets),
                              alpha=0.5, gamma=2.0))
    tl, tt = _t(logits), _t(targets)
    bce = TF.binary_cross_entropy_with_logits(tl, tt, reduction="none")
    probs = torch.sigmoid(tl)
    pt = torch.where(tt == 1, probs, 1 - probs)
    ref = (0.5 * (1 - pt) ** 2.0 * bce).mean().item()
    assert ours == pytest.approx(ref, abs=1e-6)


def test_focal_dice(rng):
    logits, targets = _rand(rng)
    ours = float(L.focal_dice_loss(jnp.asarray(logits), jnp.asarray(targets),
                                   alpha=0.5, gamma=2.0, w_focal=0.7))
    tl, tt = _t(logits), _t(targets)
    bce = TF.binary_cross_entropy_with_logits(tl, tt, reduction="none")
    probs = torch.sigmoid(tl)
    pt = torch.where(tt == 1, probs, 1 - probs)
    focal = (0.5 * (1 - pt) ** 2.0 * bce).mean()
    inter = (probs * tt).sum((2, 3))
    denom = probs.sum((2, 3)) + tt.sum((2, 3))
    dice = 1 - ((2 * inter + 1.0) / (denom + 1.0)).mean()
    ref = (0.7 * focal + 0.3 * dice).item()
    assert ours == pytest.approx(ref, abs=1e-6)


def test_focal_kernel_forward(rng):
    """CUDA focal kernel math: -|y-p|^g (y a log p + (1-y)(1-a) log(1-p))."""
    logits, targets = _rand(rng)
    ours = np.asarray(L.focal_loss_kernel(jnp.asarray(logits), jnp.asarray(targets),
                                          2.0, 0.25))
    tl, tt = torch.from_numpy(logits), torch.from_numpy(targets)
    prob = torch.sigmoid(tl)
    log_p = TF.logsigmoid(tl)
    ce = tt * 0.25 * log_p + (1 - tt) * 0.75 * (log_p - tl)
    ref = (-(tt - prob).abs() ** 2.0 * ce).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_focal_kernel_custom_vjp_matches_autodiff(rng):
    """The hand-derived backward (focal_kernel.cu:55-90) must equal
    autodiff of the forward — the reference's own V1-vs-V2 test pattern
    (label_smooth.py:180-259)."""
    logits, targets = _rand(rng, b=2, h=8, w=8)
    jl, jt = jnp.asarray(logits), jnp.asarray(targets)

    g_custom = jax.grad(lambda x: jnp.sum(L.focal_loss_kernel(x, jt, 2.0, 0.25)))(jl)

    tl = torch.from_numpy(logits).requires_grad_(True)
    tt = torch.from_numpy(targets)
    prob = torch.sigmoid(tl)
    log_p = TF.logsigmoid(tl)
    ce = tt * 0.25 * log_p + (1 - tt) * 0.75 * (log_p - tl)
    (-(tt - prob).abs() ** 2.0 * ce).sum().backward()
    np.testing.assert_allclose(np.asarray(g_custom), tl.grad.numpy(),
                               atol=1e-4, rtol=1e-3)


def test_soft_dice_kernel_semantics(rng):
    logits, targets = _rand(rng)
    ours = np.asarray(L.soft_dice_loss(jnp.asarray(logits), jnp.asarray(targets),
                                       p=1.0, smooth=1.0))
    tl, tt = torch.from_numpy(logits), torch.from_numpy(targets)
    probs = torch.sigmoid(tl)
    numer = (2 * probs * tt).sum((1, 2, 3))
    denor = (probs ** 1.0 + tt).sum((1, 2, 3))
    ref = (1 - (numer + 1.0) / (denor + 1.0)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    # p=2 variant
    ours2 = np.asarray(L.soft_dice_loss(jnp.asarray(logits), jnp.asarray(targets), p=2.0))
    denor2 = (probs ** 2.0 + tt).sum((1, 2, 3))
    ref2 = (1 - (numer + 1.0) / (denor2 + 1.0)).numpy()
    np.testing.assert_allclose(ours2, ref2, atol=1e-6)
