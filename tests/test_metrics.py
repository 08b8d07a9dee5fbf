"""Metrics vs a torch oracle re-implementing the reference math
(train_bce_dice.py:201-232, train_with_pretrained.py:218-236,
finetune_for_224.py:224-248)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from cartseg_tpu import metrics as M


def _rand(rng, b=4, h=32, w=32):
    logits = rng.normal(size=(b, h, w, 1)).astype(np.float32) * 3
    targets = (rng.random((b, h, w, 1)) > 0.6).astype(np.float32)
    return logits, targets


def _t(x):  # NHWC numpy -> NCHW torch
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def torch_soft_dice(logits, targets, smooth=1.0, eps=1e-7):
    probs = torch.sigmoid(logits)
    inter = (probs * targets).sum((2, 3))
    denom = probs.sum((2, 3)) + targets.sum((2, 3))
    return ((2 * inter + smooth) / (denom + smooth + eps)).mean().item()


def torch_iou(logits, targets, t=0.5, eps=1e-7):
    preds = (torch.sigmoid(logits) > t).float()
    inter = (preds * targets).sum((2, 3))
    union = preds.sum((2, 3)) + targets.sum((2, 3)) - inter
    return ((inter + eps) / (union + eps)).mean().item()


def test_soft_dice_matches_torch(rng):
    logits, targets = _rand(rng)
    ours = float(M.soft_dice(jnp.asarray(logits), jnp.asarray(targets)))
    ref = torch_soft_dice(_t(logits), _t(targets))
    assert ours == pytest.approx(ref, abs=1e-5)


def test_iou_matches_torch(rng):
    logits, targets = _rand(rng)
    ours = float(M.iou_at(jnp.asarray(logits), jnp.asarray(targets)))
    ref = torch_iou(_t(logits), _t(targets))
    assert ours == pytest.approx(ref, abs=1e-5)


def test_dice_iou_at_threshold(rng):
    logits, targets = _rand(rng)
    tl, tt = _t(logits), _t(targets)
    for t in (0.3, 0.5, 0.7):
        d, i = M.dice_iou_at(jnp.asarray(logits), jnp.asarray(targets), t)
        preds = (torch.sigmoid(tl) > t).float()
        inter = (preds * tt).sum((1, 2, 3))
        den = preds.sum((1, 2, 3)) + tt.sum((1, 2, 3))
        union = den - inter
        eps = 1e-7
        rd = ((2 * inter + eps) / (den + eps)).mean().item()
        ri = ((inter + eps) / (union + eps)).mean().item()
        assert float(d) == pytest.approx(rd, abs=1e-5)
        assert float(i) == pytest.approx(ri, abs=1e-5)


def test_precision_recall_f1(rng):
    logits, targets = _rand(rng)
    p, r, f1 = M.precision_recall_f1(jnp.asarray(logits), jnp.asarray(targets))
    tl, tt = _t(logits), _t(targets)
    preds = (torch.sigmoid(tl) > 0.5).float()
    eps = 1e-7
    tp = (preds * tt).sum((1, 2, 3))
    fp = (preds * (1 - tt)).sum((1, 2, 3))
    fn = ((1 - preds) * tt).sum((1, 2, 3))
    rp = ((tp + eps) / (tp + fp + eps)).mean().item()
    rr = ((tp + eps) / (tp + fn + eps)).mean().item()
    rf = (2 * ((tp + eps) / (tp + fp + eps)) * ((tp + eps) / (tp + fn + eps))
          / ((tp + eps) / (tp + fp + eps) + (tp + eps) / (tp + fn + eps) + eps)).mean().item()
    assert float(p) == pytest.approx(rp, abs=1e-5)
    assert float(r) == pytest.approx(rr, abs=1e-5)
    assert float(f1) == pytest.approx(rf, abs=1e-5)


def test_threshold_sweep_matches_pointwise(rng):
    logits, targets = _rand(rng)
    ts = np.linspace(0.2, 0.8, 13)
    dices, ious = M.threshold_sweep_stats(jnp.asarray(logits), jnp.asarray(targets), ts)
    for k, t in enumerate(ts):
        d, i = M.dice_iou_at(jnp.asarray(logits), jnp.asarray(targets), float(t))
        assert float(dices[k]) == pytest.approx(float(d), abs=1e-6)
        assert float(ious[k]) == pytest.approx(float(i), abs=1e-6)


def test_threshold_sweep_dice_smooth_matches_reference_formula(rng):
    logits, targets = _rand(rng)
    ts = np.linspace(0.2, 0.8, 13)
    out = M.threshold_sweep_dice_smooth(jnp.asarray(logits), jnp.asarray(targets), ts)
    tl, tt = _t(logits), _t(targets)
    for k, t in enumerate(ts):
        preds = (torch.sigmoid(tl) > t).float()
        inter = (preds * tt).sum((2, 3))
        denom = preds.sum((2, 3)) + tt.sum((2, 3))
        ref = ((2 * inter + 1.0) / (denom + 1.0)).mean().item()
        assert float(out[k]) == pytest.approx(ref, abs=1e-5)


def test_eval_suite_keys(rng):
    logits, targets = _rand(rng)
    out = M.eval_suite(jnp.asarray(logits), jnp.asarray(targets))
    assert set(out) == {"dice", "iou", "dice_bin", "iou_bin",
                        "precision", "recall", "f1"}


def test_eval_suite_sums_masks_padding_exactly(rng):
    """Cycle-padded tail duplicates (w=0) must contribute nothing:
    weighted sums over the padded batch divided by n equal eval_suite
    means over the unpadded prefix (VERDICT r1 weak #7)."""
    logits, targets = _rand(rng)
    n_real = logits.shape[0] - 2
    padded_l = np.concatenate([logits, logits[:2] * 3.0])
    padded_t = np.concatenate([targets, 1.0 - targets[:2]])
    w = np.concatenate([np.ones(logits.shape[0]), np.zeros(2)])
    # but only the first n_real of the originals count
    w[n_real:logits.shape[0]] = 0.0
    sums, n = M.eval_suite_sums(jnp.asarray(padded_l), jnp.asarray(padded_t),
                                jnp.asarray(w))
    assert float(n) == n_real
    exact = M.eval_suite(jnp.asarray(logits[:n_real]),
                         jnp.asarray(targets[:n_real]))
    for k in exact:
        assert float(sums[k]) / n_real == pytest.approx(float(exact[k]),
                                                        abs=1e-5)


def test_threshold_sweep_sums_masks_padding_exactly(rng):
    logits, targets = _rand(rng)
    ts = np.linspace(0.2, 0.8, 5)
    pad_l = np.concatenate([logits, logits[:3]])
    pad_t = np.concatenate([targets, targets[:3]])
    w = np.concatenate([np.ones(logits.shape[0]), np.zeros(3)])
    d, i, n = M.threshold_sweep_sums(jnp.asarray(pad_l), jnp.asarray(pad_t),
                                     ts, jnp.asarray(w))
    dref, iref = M.threshold_sweep_stats(jnp.asarray(logits),
                                         jnp.asarray(targets), ts)
    np.testing.assert_allclose(np.asarray(d) / float(n), np.asarray(dref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(i) / float(n), np.asarray(iref),
                               atol=1e-6)
