"""Boundary-loss parity: SDF loss vs a scipy/torch oracle, ABL vs an
independent torch re-statement of the reference algorithm
(src/training/losses/abl.py:32-212) run on CPU at B=1 (where the
reference's get_dist_maps batching is well-defined)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF
from scipy.ndimage import distance_transform_edt as sp_edt

import jax.numpy as jnp

from cartseg_tpu import losses as L


def _mask_batch(rng, b=2, h=32, w=32):
    m = np.zeros((b, h, w, 1), np.float32)
    for i in range(b):
        cy, cx = rng.integers(8, h - 8), rng.integers(8, w - 8)
        m[i, cy - 6:cy + 6, cx - 6:cx + 6, 0] = 1.0
    return m


# ------------------------------------------------------------- SDF loss

def np_sdf(mask):
    mask = mask.astype(bool)
    if mask.any() and (~mask).any():
        return (sp_edt(~mask) - sp_edt(mask)).astype(np.float32)
    return np.zeros(mask.shape, np.float32)


def test_signed_distance_map_matches_scipy(rng):
    m = _mask_batch(rng, b=1)[0, :, :, 0]
    ours = np.asarray(L.signed_distance_map(jnp.asarray(m > 0.5)))
    ref = np_sdf(m)
    assert np.abs(ours - ref).max() < 0.5
    assert np.abs(ours - ref).mean() < 0.01


def test_signed_distance_degenerate_is_zero():
    z = np.asarray(L.signed_distance_map(jnp.zeros((16, 16), bool)))
    o = np.asarray(L.signed_distance_map(jnp.ones((16, 16), bool)))
    assert (z == 0).all() and (o == 0).all()


def test_symmetric_boundary_loss_matches_oracle(rng):
    logits = rng.normal(size=(2, 32, 32, 1)).astype(np.float32) * 3
    targets = _mask_batch(rng)
    ours = float(L.symmetric_boundary_loss(jnp.asarray(logits), jnp.asarray(targets)))

    # torch oracle (train_with_boundary_loss.py:225-264)
    tl = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    tt = torch.from_numpy(np.transpose(targets, (0, 3, 1, 2)))
    probs = torch.sigmoid(tl)
    B, _, H, W = tt.shape
    sdf_gt = torch.stack([torch.from_numpy(np_sdf(tt[b, 0].numpy() > 0.5))
                          for b in range(B)])[:, None] / max(H, W)
    pred = (probs > 0.5).float()
    sdf_pred = torch.stack([torch.from_numpy(np_sdf(pred[b, 0].numpy() > 0.5))
                            for b in range(B)])[:, None] / max(H, W)
    ref = (1.0 * (probs * sdf_gt).abs().mean()
           + 0.5 * ((1 - probs) * (-sdf_pred)).abs().mean()).item()
    assert ours == pytest.approx(ref, abs=2e-3)  # JFA vs exact EDT tolerance


def test_composite_seg_loss_combines(rng):
    logits = rng.normal(size=(1, 32, 32, 1)).astype(np.float32)
    targets = _mask_batch(rng, b=1)
    total = float(L.composite_seg_loss(jnp.asarray(logits), jnp.asarray(targets),
                                       boundary_weight=0.3))
    reg = float(L.bce_dice_loss(jnp.asarray(logits), jnp.asarray(targets)))
    bnd = float(L.symmetric_boundary_loss(jnp.asarray(logits), jnp.asarray(targets)))
    assert total == pytest.approx(0.7 * reg + 0.3 * bnd, abs=1e-5)


# ------------------------------------------------------------------ ABL

def torch_abl_oracle(logits_np, target_np, max_N_ratio=1 / 100.,
                     lb_smooth=0.2, max_clip=20.0):
    """Independent CPU restatement of ABL (abl.py:32-212) at B=1.
    logits_np [1,H,W,1], target_np [1,H,W] int."""
    lg = torch.from_numpy(np.transpose(logits_np, (0, 3, 1, 2))).float()
    tg = torch.from_numpy(target_np).long()

    def kl(a, b):
        return TF.softmax(b, 1) * (TF.log_softmax(b, 1) - TF.log_softmax(a, 1))

    pf = torch.sigmoid(lg)
    probs = torch.cat([1 - pf, pf], dim=1)  # [1,2,H,W]

    # gt boundary
    ud = TF.pad(tg[:, 1:, :] - tg[:, :-1, :], (0, 0, 0, 1)) != 0
    lr = TF.pad(tg[:, :, 1:] - tg[:, :, :-1], (0, 1, 0, 0)) != 0
    gtb = (ud | lr)

    # dist map = max(0, EDT(boundary)-1) (one_hot2dist ch0 -> clip)
    b = gtb[0].numpy()
    if b.any():
        dist = np.maximum(sp_edt(~b) - 1.0, 0.0)
    else:
        dist = np.zeros_like(b, float)
    dist_map = torch.from_numpy(dist[None]).float()

    # pred boundary with adaptive eps + dilation
    h, w = lg.shape[2:]
    kl_ud = TF.pad(kl(probs[:, :, 1:, :], probs[:, :, :-1, :]).sum(1, keepdim=True),
                   (0, 0, 0, 1))
    kl_lr = TF.pad(kl(probs[:, :, :, 1:], probs[:, :, :, :-1]).sum(1, keepdim=True),
                   (0, 1, 0, 0))
    klc = kl_ud + kl_lr
    eps = 1e-5
    max_N = h * w * max_N_ratio
    while (klc > eps).float().sum() > max_N:
        eps *= 1.2
    binm = (klc > eps).float()
    edge2 = TF.conv2d(binm, torch.ones(1, 1, 3, 3), padding=1).squeeze(1)
    pred_bound = edge2 > 0  # [1,H,W]
    if pred_bound.sum() < 1:
        return None

    nz = torch.nonzero(pred_bound * 1)
    n, x, y = nz.T
    dist_pad = TF.pad(dist_map, (1, 1, 1, 1), value=1e5)
    lgt = probs.permute(0, 2, 3, 1)  # NHWC
    lgt_d = TF.pad(lgt, (0, 0, 1, 1, 1, 1))
    lgt_d[:, 0] = lgt_d[:, 1]
    lgt_d[:, -1] = lgt_d[:, -2]
    lgt_d[:, :, 0] = lgt_d[:, :, 1]
    lgt_d[:, :, -1] = lgt_d[:, :, -2]

    x_range = [1, -1, 0, 0, -1, 1, -1, 1, 0]
    y_range = [0, 0, -1, 1, 1, 1, -1, -1, 0]
    dist_stack, kl_stack = [], []
    center = lgt[(n, x, y)]
    for dx, dy in zip(x_range, y_range):
        dist_stack.append(dist_pad[(n, x + dx + 1, y + dy + 1)])
        if dx != 0 or dy != 0:
            nb = lgt_d[(n, x + dx + 1, y + dy + 1)].detach()
            klm = (TF.softmax(nb, 1) * (TF.log_softmax(nb, 1)
                                        - TF.log_softmax(center, 1))).sum(1)
            kl_stack.append(klm)
    dist_stack = torch.stack(dist_stack)            # [9,K]
    kl_stack = torch.stack(kl_stack).T              # [K,8]
    direction_gt = torch.argmin(dist_stack, dim=0)  # [K]
    weight = dist_map[(n, x, y)]
    keep = direction_gt != 8
    dgt = direction_gt[keep]
    dpred = kl_stack[keep]
    weight = torch.clamp(weight[keep], max=max_clip) / max_clip

    # label-smooth CE over 8 directions, reduction none
    C = 8
    lb_pos, lb_neg = 1 - lb_smooth, lb_smooth / C
    oh = torch.full_like(dpred, lb_neg).scatter_(1, dgt[:, None], lb_pos)
    ce = -(TF.log_softmax(dpred.float(), 1) * oh).sum(1)
    return (ce * weight).mean().item()


@pytest.mark.parametrize("seed", [0, 7])
def test_abl_matches_torch_oracle(seed):
    rng = np.random.default_rng(seed)
    h = w = 48
    logits = rng.normal(size=(1, h, w, 1)).astype(np.float32) * 2
    target = np.zeros((1, h, w), np.int32)
    target[0, 12:30, 10:35] = 1
    ref = torch_abl_oracle(logits, target)
    loss, n_valid = L.active_boundary_loss(jnp.asarray(logits), jnp.asarray(target))
    assert int(n_valid) > 0 and ref is not None
    assert float(loss) == pytest.approx(ref, abs=2e-3)


def test_abl_empty_boundary_signals_skip():
    # flat logits + flat target: prediction boundary can't exceed eps
    logits = np.zeros((1, 32, 32, 1), np.float32)
    target = np.zeros((1, 32, 32), np.int32)
    loss, n_valid = L.active_boundary_loss(jnp.asarray(logits), jnp.asarray(target))
    assert int(n_valid) == 0


def test_bce_dice_abl_composite(rng):
    logits = rng.normal(size=(1, 32, 32, 1)).astype(np.float32) * 2
    targets = _mask_batch(rng, b=1)
    total, comps = L.bce_dice_abl(jnp.asarray(logits), jnp.asarray(targets),
                                  abl_weight=0.1)
    reg = float(L.bce_dice_loss(jnp.asarray(logits), jnp.asarray(targets)))
    assert float(comps["region"]) == pytest.approx(reg, abs=1e-6)
    assert float(total) == pytest.approx(
        reg + 0.1 * float(comps["boundary"]), abs=1e-5)


def test_abl_is_differentiable(rng):
    import jax
    logits = rng.normal(size=(1, 32, 32, 1)).astype(np.float32) * 2
    target = np.zeros((1, 32, 32), np.int32)
    target[0, 8:24, 8:24] = 1

    def f(x):
        loss, _ = L.active_boundary_loss(x, jnp.asarray(target))
        return loss

    g = jax.grad(f)(jnp.asarray(logits))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_parity_harness_abl_twin_matches_batch_semantics():
    """The parity-family harness's differentiable torch ABL twin
    (benchmarks/parity_families.py::abl_torch_batch) must agree with
    the B=1 oracle above AND with the jax loss at B>1, where the
    whole-batch adaptive-eps budget (abl.py:67-81) is exercised."""
    from benchmarks.parity_families import abl_torch_batch

    # B=1 vs the independent oracle
    rng = np.random.default_rng(2)
    logits = rng.normal(0, 2, (1, 48, 48, 1)).astype(np.float32)
    target = (rng.random((1, 48, 48)) > 0.6).astype(np.int64)
    ref = torch_abl_oracle(logits, target)
    lg = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))).float()
    tg = torch.from_numpy(target[:, None].astype(np.float32))
    got = abl_torch_batch(lg, tg)
    assert got is not None and ref is not None
    assert got.item() == pytest.approx(ref, rel=1e-6, abs=1e-9)

    # B=4 vs the jax implementation (blob masks -> nonzero weights)
    rng = np.random.default_rng(5)
    B, H, W = 4, 48, 48
    yy, xx = np.mgrid[:H, :W]
    target = np.stack([
        ((yy - rng.integers(10, 38)) ** 2
         + (xx - rng.integers(10, 38)) ** 2 < rng.integers(6, 14) ** 2)
        for _ in range(B)]).astype(np.int64)
    logits = (target[..., None] * 4.0 - 2.0
              + rng.normal(0, 1.5, (B, H, W, 1))).astype(np.float32)
    lg = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))).float()
    lg.requires_grad_(True)
    tg = torch.from_numpy(target[:, None].astype(np.float32))
    t_loss = abl_torch_batch(lg, tg)
    j_loss, n_valid = L.active_boundary_loss(jnp.asarray(logits),
                                             jnp.asarray(target))
    assert int(n_valid) > 0
    assert t_loss.item() == pytest.approx(float(j_loss), rel=1e-5)
    t_loss.backward()  # grad must flow for the torch family trainer
    assert float(lg.grad.abs().sum()) > 0
