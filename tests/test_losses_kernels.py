"""Parity tests for the CUDA-zoo equivalents: label-smooth CE (V1 math
+ fused V2 backward), lovasz, large-margin, taylor softmax, OHEM,
activations, layer norm. Oracles are independent torch/numpy
implementations of the published formulas."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from cartseg_tpu import losses as L


# ---------------------------------------------------------------- LSR CE

def torch_lsr_ce(logits, label, lb_smooth=0.1, ignore=-100, reduction="mean"):
    # V1 math (label_smooth.py:26-54)
    logits = logits.float()
    C = logits.size(1)
    ig = label.eq(ignore)
    n_valid = (~ig).sum()
    lab = label.clone()
    lab[ig] = 0
    lb_pos, lb_neg = 1.0 - lb_smooth, lb_smooth / C
    oh = torch.full_like(logits, lb_neg).scatter_(1, lab.unsqueeze(1), lb_pos)
    logs = TF.log_softmax(logits, dim=1)
    loss = -(logs * oh).sum(1)
    loss[ig] = 0
    if reduction == "mean":
        return loss.sum() / n_valid
    return loss


def _lsr_data(rng, C=8):
    logits = rng.normal(size=(2, 16, 16, C)).astype(np.float32) * 3
    labels = rng.integers(0, C, size=(2, 16, 16)).astype(np.int32)
    labels[0, :3, :3] = 255  # ignore patch
    return logits, labels


def test_lsr_ce_matches_torch_v1(rng):
    logits, labels = _lsr_data(rng)
    ours = float(L.lsr_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                     lb_smooth=0.1, ignore_index=255))
    tl = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    ref = torch_lsr_ce(tl, torch.from_numpy(labels.astype(np.int64)),
                       0.1, 255).item()
    assert ours == pytest.approx(ref, abs=1e-5)


def test_lsr_fused_forward_matches_oracle(rng):
    logits, labels = _lsr_data(rng)
    a = np.asarray(L.lsr_cross_entropy_fused(jnp.asarray(logits), jnp.asarray(labels),
                                             0.1, 255))
    b = np.asarray(L.lsr_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                       0.1, reduction="none", ignore_index=255))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_lsr_fused_backward_matches_autodiff(rng):
    """V2's hand-derived grad vs V1 autodiff — the reference's own
    equivalence harness (label_smooth.py:180-259)."""
    logits, labels = _lsr_data(rng)
    jl, jb = jnp.asarray(logits), jnp.asarray(labels)
    g1 = jax.grad(lambda x: jnp.sum(L.lsr_cross_entropy_fused(x, jb, 0.1, 255)))(jl)
    g2 = jax.grad(lambda x: jnp.sum(L.lsr_cross_entropy(x, jb, 0.1,
                                                        reduction="none",
                                                        ignore_index=255)))(jl)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_smooth_one_hot(rng):
    labels = rng.integers(0, 4, size=(5, 6)).astype(np.int32)
    labels[0, 0] = -100
    oh = np.asarray(L.smooth_one_hot(jnp.asarray(labels), 4, 0.2))
    assert oh.shape == (5, 6, 4)
    assert (oh[0, 0] == 0).all()
    k = labels[1, 1]
    assert oh[1, 1, k] == pytest.approx(0.8)
    assert oh[1, 1, (k + 1) % 4] == pytest.approx(0.05)


# ---------------------------------------------------------------- Lovasz

def np_lovasz_grad(gt_sorted):
    gts = gt_sorted.sum()
    intersection = gts - np.cumsum(gt_sorted)
    union = gts + np.cumsum(1 - gt_sorted)
    jaccard = 1.0 - intersection / union
    if len(gt_sorted) > 1:
        jaccard[1:] = jaccard[1:] - jaccard[:-1]
    return jaccard


def np_lovasz_softmax(probs, labels, classes="present"):
    # probs [P,C], labels [P]
    C = probs.shape[1]
    losses = []
    for c in range(C):
        fg = (labels == c).astype(np.float64)
        if classes == "present" and fg.sum() == 0:
            continue
        errors = np.abs(fg - probs[:, c])
        perm = np.argsort(-errors, kind="stable")
        losses.append(np.dot(errors[perm], np_lovasz_grad(fg[perm])))
    return np.mean(losses) if losses else 0.0


def test_lovasz_softmax_matches_numpy(rng):
    C = 4
    logits = rng.normal(size=(2, 12, 12, C)).astype(np.float32) * 2
    labels = rng.integers(0, C, size=(2, 12, 12)).astype(np.int32)
    ours = float(L.lovasz_softmax(jnp.asarray(logits), jnp.asarray(labels)))
    refs = []
    for b in range(2):
        p = np.asarray(jax.nn.softmax(jnp.asarray(logits[b]), -1)).reshape(-1, C)
        refs.append(np_lovasz_softmax(p, labels[b].reshape(-1)))
    assert ours == pytest.approx(float(np.mean(refs)), abs=1e-4)


def test_lovasz_hinge_matches_numpy(rng):
    logits = rng.normal(size=(2, 10, 10)).astype(np.float32) * 2
    labels = (rng.random((2, 10, 10)) > 0.5).astype(np.int32)
    ours = float(L.lovasz_hinge(jnp.asarray(logits), jnp.asarray(labels)))
    refs = []
    for b in range(2):
        lg, lb = logits[b].reshape(-1), labels[b].reshape(-1).astype(np.float64)
        signs = 2 * lb - 1
        errors = 1 - lg * signs
        perm = np.argsort(-errors, kind="stable")
        refs.append(np.dot(np.maximum(errors[perm], 0), np_lovasz_grad(lb[perm])))
    assert ours == pytest.approx(float(np.mean(refs)), abs=1e-4)


def test_lovasz_differentiable(rng):
    logits = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    labels = rng.integers(0, 3, size=(1, 8, 8)).astype(np.int32)
    g = jax.grad(lambda x: L.lovasz_softmax(x, jnp.asarray(labels)))(jnp.asarray(logits))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


# ------------------------------------------------------------ large margin

def test_large_margin_matches_formula(rng):
    C = 6
    logits = rng.normal(size=(64, C)).astype(np.float32) * 2
    labels = rng.integers(0, C, size=(64,)).astype(np.int32)
    lam = 0.3
    ours = float(L.large_margin_softmax(jnp.asarray(logits), jnp.asarray(labels),
                                        lam=lam))
    tl = torch.from_numpy(logits)
    tlab = torch.from_numpy(labels.astype(np.int64))
    ce = TF.cross_entropy(tl, tlab, reduction="none")
    # q = softmax over non-target classes
    masked = tl.clone()
    masked[torch.arange(64), tlab] = -1e30
    logq = TF.log_softmax(masked, dim=1)
    q = logq.exp()
    term = (q - 1.0 / (C - 1)) * logq
    term[torch.arange(64), tlab] = 0
    ref = (ce + lam / 2 * term.sum(1)).mean().item()
    assert ours == pytest.approx(ref, abs=1e-4)


# ------------------------------------------------------------ taylor softmax

def test_taylor_softmax_math(rng):
    x = rng.normal(size=(4, 7)).astype(np.float32)
    for n in (2, 4):
        ours = np.asarray(L.taylor_softmax(jnp.asarray(x), n=n))
        t = np.ones_like(x, dtype=np.float64)
        acc = np.ones_like(x, dtype=np.float64)
        fact = 1.0
        for i in range(1, n + 1):
            acc = acc * x
            fact *= i
            t = t + acc / fact
        ref = t / t.sum(-1, keepdims=True)
        np.testing.assert_allclose(ours, ref, atol=1e-4)
        assert (ours > 0).all()
        logs = np.asarray(L.log_taylor_softmax(jnp.asarray(x), n=n))
        np.testing.assert_allclose(np.exp(logs), ref, atol=1e-4)


def test_taylor_ce_runs_and_is_finite(rng):
    logits = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=(2, 8, 8)).astype(np.int32)
    v = float(L.taylor_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), n=2))
    assert np.isfinite(v) and v > 0


# ------------------------------------------------------------------- OHEM

def test_ohem_semantics(rng):
    C = 4
    logits = rng.normal(size=(2, 8, 8, C)).astype(np.float32) * 3
    labels = rng.integers(0, C, size=(2, 8, 8)).astype(np.int32)
    out = np.asarray(L.ohem_labels(jnp.asarray(logits), jnp.asarray(labels),
                                   score_thresh=0.5, n_min=10, ignore_index=255))
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), -1))
    scores = np.take_along_axis(probs.reshape(-1, C),
                                labels.reshape(-1, 1), 1)[:, 0]
    order = np.argsort(scores)
    kept_hard = order[:10]
    flat = out.reshape(-1)
    # the 10 hardest are never relabeled
    assert (flat[kept_hard] == labels.reshape(-1)[kept_hard]).all()
    # everything above threshold outside the kept set is ignored
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    should_drop = (rank >= 10) & (scores > 0.5)
    assert (flat[should_drop] == 255).all()
    assert (flat[~should_drop] == labels.reshape(-1)[~should_drop]).all()


# ------------------------------------------------------------- activations

@pytest.mark.parametrize("name", ["mish", "swish", "hswish"])
def test_activation_forward_and_grad_vs_torch(name, rng):
    x = rng.normal(size=(64,)).astype(np.float32) * 5
    jx = jnp.asarray(x)
    tx = torch.from_numpy(x).requires_grad_(True)
    ours_f = {"mish": L.mish, "swish": L.swish, "hswish": L.hswish}[name]
    tref = {"mish": TF.mish, "swish": TF.silu, "hswish": TF.hardswish}[name]
    np.testing.assert_allclose(np.asarray(ours_f(jx)), tref(tx).detach().numpy(),
                               atol=1e-3)  # XLA CPU tanh approx near saturation
    g = jax.grad(lambda v: jnp.sum(ours_f(v)))(jx)
    tref(tx).sum().backward()
    np.testing.assert_allclose(np.asarray(g), tx.grad.numpy(), atol=1e-3)


# --------------------------------------------------------------- layernorm

def test_layer_norm_matches_torch(rng):
    x = rng.normal(size=(4, 10, 16)).astype(np.float32)
    w = rng.normal(size=(16,)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)
    ours = np.asarray(L.layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    tx = torch.from_numpy(x).requires_grad_(True)
    tw = torch.from_numpy(w).requires_grad_(True)
    tb = torch.from_numpy(b).requires_grad_(True)
    ref = TF.layer_norm(tx, (16,), tw, tb)
    np.testing.assert_allclose(ours, ref.detach().numpy(), atol=1e-5)

    gx, gw, gb = jax.grad(
        lambda a, ww, bb: jnp.sum(L.layer_norm(a, ww, bb) * 1.7),
        argnums=(0, 1, 2))(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    (ref * 1.7).sum().backward()
    np.testing.assert_allclose(np.asarray(gx), tx.grad.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), tw.grad.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), tb.grad.numpy(), atol=1e-4)


def test_pallas_loss_dispatch_parity(monkeypatch, rng):
    """CARTSEG_PALLAS_LOSSES routes soft_dice / focal_kernel / ABL CE
    through the Tier-B kernels; outputs must match the XLA lane (on CPU
    the kernels run in interpret mode)."""
    import cartseg_tpu.losses.region as R

    logits = rng.normal(size=(2, 24, 24, 1)).astype(np.float32) * 2
    labels = (rng.random((2, 24, 24, 1)) > 0.5).astype(np.float32)
    jl, jt = jnp.asarray(logits), jnp.asarray(labels)
    base_sd = np.asarray(R.soft_dice_loss(jl, jt))
    base_fk = np.asarray(R.focal_loss_kernel(jl, jt))
    monkeypatch.setattr(R, "use_pallas_losses", lambda: True)
    np.testing.assert_allclose(np.asarray(R.soft_dice_loss(jl, jt)),
                               base_sd, atol=1e-5)
    np.testing.assert_allclose(np.asarray(R.focal_loss_kernel(jl, jt)),
                               base_fk, atol=1e-5)
