"""Active Boundary Loss (src/training/losses/abl.py:32-212), fully on
device — the reference's hardest TPU-port case (SURVEY.md section 7
"hard parts" #1):

  * per-sample CPU scipy EDT (abl.py:165-171)    -> jump-flood EDT
  * `torch.nonzero` dynamic gather (abl.py:107)  -> masked-dense over
    all pixels (direction stacks are [9,B,H,W]; the boundary mask
    weights the final reduction)
  * data-dependent adaptive-eps `while True`     -> `lax.while_loop`
  * `.cuda()` dilation conv (abl.py:83)          -> 3x3 max-pool

Semantics notes for parity:
  * The neighbor offset order is the reference's exact table
    (abl.py:121-127); index 8 is the center ("no direction").
  * `kl_div(a, b)` treats its inputs as *logits* even though ABL feeds
    it probabilities (abl.py:188-193 stacks [1-sigma, sigma] and then
    kl_div softmaxes again) — replicated verbatim.
  * The GT distance map is max(0, EDT(gt_boundary) - 1) at non-boundary
    pixels (abl.py:17-24,165-171 via one_hot2dist channel 0). The
    reference's `torch.cat` in get_dist_maps interleaves the two
    one-hot channels across the batch, which mis-indexes samples for
    B>1; we implement the intended per-sample map (bit-identical to
    the reference at B=1, which is what its self-test uses).
  * Returns (loss, n_valid); the reference returns None when the
    predicted boundary is empty (abl.py:201-202) — callers use
    n_valid > 0 as the skip signal, keeping the step jit-compatible.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from cartseg_tpu.ops.edt import edt_batch
from cartseg_tpu.losses.label_smooth import lsr_cross_entropy
from cartseg_tpu.losses.region import bce_dice_loss

# reference offset table (abl.py:121-127); dx indexes H, dy indexes W
_X_RANGE = (1, -1, 0, 0, -1, 1, -1, 1, 0)
_Y_RANGE = (0, 0, -1, 1, 1, 1, -1, -1, 0)
_MAX_DIS = 1e5


def _kl_div(a, b):
    """softmax(b) * (log_softmax(b) - log_softmax(a)), channels-last."""
    return jax.nn.softmax(b, axis=-1) * (
        jax.nn.log_softmax(b, axis=-1) - jax.nn.log_softmax(a, axis=-1))


def gt2boundary(gt, ignore_label: int = 255):
    """[B,H,W] int/float labels -> [B,H,W] bool boundary
    (abl.py:89-101): 1-px finite-difference edges, ignore area counts
    as all-boundary."""
    gt = jnp.asarray(gt)
    ud = jnp.pad(gt[:, 1:, :] - gt[:, :-1, :], ((0, 0), (0, 1), (0, 0))) != 0
    lr = jnp.pad(gt[:, :, 1:] - gt[:, :, :-1], ((0, 0), (0, 0), (0, 1))) != 0
    return ud | lr | (gt == ignore_label)


def logits2boundary(probs2, max_N_ratio: float = 1.0 / 100):
    """[B,H,W,2] class scores -> [B,H,W] bool predicted boundary
    (abl.py:65-87): neighbor-KL edges, adaptive eps so at most
    max_N_ratio of pixels fire, then 3x3 dilation.

    The reference's `while eps *= 1.2` re-counts the whole image each
    iteration (tens of sequential full reductions). The loop's fixpoint
    has a closed form on the same 1.2-grid: the smallest
    eps = 1e-5 * 1.2^k with count(kl > eps) <= max_N is determined by
    the (max_N+1)-th largest kl value — one device sort replaces the
    loop, bit-identical decision."""
    B, H, W, _ = probs2.shape
    max_N = (H * W) * max_N_ratio  # per the reference: image-area budget
    kl_ud = jnp.sum(_kl_div(probs2[:, 1:, :, :], probs2[:, :-1, :, :]), -1)
    kl_lr = jnp.sum(_kl_div(probs2[:, :, 1:, :], probs2[:, :, :-1, :]), -1)
    kl_ud = jnp.pad(kl_ud, ((0, 0), (0, 1), (0, 0)))
    kl_lr = jnp.pad(kl_lr, ((0, 0), (0, 0), (0, 1)))
    kl_combine = kl_ud + kl_lr

    flat = kl_combine.reshape(-1)
    k = int(max_N)  # count(kl > eps) <= max_N <=> eps >= (k+1)-th largest
    if k + 1 <= flat.shape[0]:
        kth = jax.lax.top_k(flat, k + 1)[0][-1]
    else:
        kth = jnp.min(flat) - 1.0
    base = jnp.float32(1e-5)
    # smallest grid point >= kth (and >= base, matching loop start)
    n = jnp.ceil(jnp.log(jnp.maximum(kth, base) / base)
                 / jnp.log(jnp.float32(1.2)))
    eps = base * jnp.float32(1.2) ** jnp.maximum(n, 0.0)
    # grid point must satisfy count(kl > eps) <= max_N; kth may sit
    # exactly on a grid point, where `>` keeps count <= max_N already
    eps = jnp.where(jnp.sum(flat > eps) > max_N, eps * 1.2, eps)

    edge = (kl_combine > eps).astype(jnp.float32)
    # 3x3 dilation == max pool
    dil = jax.lax.reduce_window(
        edge, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1),
        [(0, 0), (1, 1), (1, 1)])
    return dil > 0


def gt_dist_maps(gt_boundary):
    """[B,H,W] bool -> [B,H,W] float distance-to-boundary map:
    max(0, EDT(boundary) - 1); zero when a sample has no boundary
    (one_hot2dist posmask.any() guard, abl.py:17-24)."""
    d = jnp.maximum(edt_batch(gt_boundary) - 1.0, 0.0)
    has = jnp.any(gt_boundary, axis=(1, 2))[:, None, None]
    return jnp.where(has, d, 0.0)


def _pad_replicate(x):
    """Pad [B,H,W,C] by 1 px replicating edges (abl.py:115-119)."""
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")


def active_boundary_loss(
    logits, target,
    max_N_ratio: float = 1.0 / 100,
    ignore_label: int = 255,
    label_smoothing: float = 0.2,
    max_clip_dist: float = 20.0,
    isdetach: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ABL forward. logits [B,H,W,1] (binary) or [B,H,W,C]; target
    [B,H,W] or [B,H,W,1] int-valued. Returns (loss, n_valid); use the
    loss only where n_valid > 0 (reference None-skip, abl.py:201-202).
    """
    logits = jnp.asarray(logits, jnp.float32)
    target = jnp.asarray(target)
    if target.ndim == 4:
        target = target[..., 0]
    target = target.astype(jnp.int32)

    if logits.shape[-1] == 1:
        pf = jax.nn.sigmoid(logits[..., 0])
        probs = jnp.stack([1.0 - pf, pf], axis=-1)  # abl.py:188-191
    else:
        probs = jax.nn.softmax(logits, axis=-1)

    gt_bound = gt2boundary(target, ignore_label)
    dist_map = gt_dist_maps(gt_bound)
    pred_bound = logits2boundary(probs, max_N_ratio)
    n_pred = jnp.sum(pred_bound)

    # --- masked-dense direction targets over every pixel ---
    dist_pad = jnp.pad(dist_map, ((0, 0), (1, 1), (1, 1)),
                       constant_values=_MAX_DIS)
    probs_pad = _pad_replicate(probs)
    H, W = dist_map.shape[1], dist_map.shape[2]

    dist_stack = jnp.stack(
        [jax.lax.dynamic_slice(
            dist_pad, (0, 1 + dx, 1 + dy),
            (dist_pad.shape[0], H, W))
         for dx, dy in zip(_X_RANGE, _Y_RANGE)], axis=0)  # [9,B,H,W]

    kl_center = probs  # [B,H,W,2]
    kls = []
    for dx, dy in zip(_X_RANGE[:8], _Y_RANGE[:8]):
        nb = jax.lax.dynamic_slice(
            probs_pad, (0, 1 + dx, 1 + dy, 0),
            (probs_pad.shape[0], H, W, probs_pad.shape[-1]))
        if isdetach:
            nb = jax.lax.stop_gradient(nb)
        kls.append(jnp.sum(_kl_div(kl_center, nb), -1))
    kl_stack = jnp.stack(kls, axis=-1)  # [B,H,W,8]

    direction_gt = jnp.argmin(dist_stack, axis=0)  # [B,H,W] in [0,9)
    valid = pred_bound & (direction_gt != 8)

    weight_ce = jnp.clip(dist_map, max=max_clip_dist) / max_clip_dist
    safe_gt = jnp.where(direction_gt == 8, 0, direction_gt)
    from cartseg_tpu.losses.region import use_pallas_losses
    if use_pallas_losses():
        # Tier-B lane: the fused Mosaic LSR kernel (ops/pallas/lsr.py),
        # the analog of the reference actually training through lsr_cpp
        # (abl_training/setup.py:13). Measured docs/CHIP_PARITY.md.
        from cartseg_tpu.ops.pallas import lsr_ce_pallas
        ce = lsr_ce_pallas(kl_stack, safe_gt.astype(jnp.int32),
                           label_smoothing, ignore_label)
    else:
        ce = lsr_cross_entropy(
            kl_stack, safe_gt, lb_smooth=label_smoothing,
            reduction="none", ignore_index=ignore_label)
    contrib = ce * weight_ce * valid.astype(jnp.float32)
    n_valid = jnp.sum(valid)
    loss = jnp.sum(contrib) / jnp.maximum(n_valid, 1)
    # empty predicted boundary -> caller must skip (n_valid carries it)
    n_valid = jnp.where(n_pred < 1, 0, n_valid)
    return loss, n_valid


def bce_dice_abl(logits, targets, bce_weight: float = 0.5,
                 abl_weight: float = 0.1, **abl_kwargs):
    """BCEDiceABL composite (src/training/train_BCEDice_ABL.py:264-302):
    region = BCE+Dice, boundary = ABL (skipped when degenerate).
    Returns (total, dict of components incl. the skip indicator)."""
    region = bce_dice_loss(logits, targets, bce_weight=bce_weight)
    targ_int = (jnp.asarray(targets)[..., 0] > 0.5).astype(jnp.int32)
    abl, n_valid = active_boundary_loss(logits, targ_int, **abl_kwargs)
    use = (n_valid > 0).astype(jnp.float32)
    total = region + abl_weight * abl * use
    return total, {"region": region, "boundary": abl * use,
                   "boundary_used": use}
