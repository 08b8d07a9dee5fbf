"""Five-family quality-parity protocol (BASELINE.md; VERDICT r1 item 5).

For each reference config family, train the reference's math in torch
on CPU and the cartseg_tpu pipeline on TPU from the SAME initial
weights (the torch twin's state dict converted via import_smp_unet),
the SAME synthetic dataset/split, the SAME per-epoch LR schedule, no
augmentation — and compare best val soft-Dice. Target: |delta| <= 0.5
points (or TPU >= torch).

Families (reference sources):
  bce_dice        train_bce_dice.py:186-199, 306-387 (resnet34)
  pretrained      src/train_with_pretrained.py:317-372 (effnet-b0,
                  ImageNet norm, freeze->unfreeze at LR x 0.3)
  focal_frozen    src/train_with_focalDice.py:195-235, 378-507
                  (FocalDice alpha=.5 gamma=2 w=.7, frozen schedule)
  focal_unfrozen  src/train_with_focalDice_unfrozen.py:389-391
                  (three LR tiers from epoch 0: enc x0.1, dec x1, head x3)
  boundary        src/train_with_boundary_loss.py:191-282 (BCE+Dice +
                  symmetric SDF boundary, wb=0.3, scipy EDT)
  abl             src/training/train_BCEDice_ABL.py:264-302, 354-404
                  (BCE+Dice + 0.1*Active Boundary Loss, scipy EDT,
                  freeze->unfreeze at LR x 0.3)
  pseudo_loop     train -> create_pseudo_labels QC gates -> finetune
                  (create_pseudo_labels.py:146-197; src/train_pseudo.py)

Run:  python -m benchmarks.parity_families [--families a,b,...]
          [--epochs 10] [--img 64] [--out /tmp/parity_families]
Writes <out>/parity_families.json.
"""

from __future__ import annotations

import argparse
import json
import math
from pathlib import Path

import numpy as np
import torch
import torch.nn.functional as F

from benchmarks.torch_smp import SmpUnetTorch
from benchmarks.torch_reference import bce_dice as bce_dice_torch

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ------------------------------------------------------------ torch side

def focal_dice_torch(logits, targets, alpha=0.5, gamma=2.0, smooth=1.0,
                     w_focal=0.7):
    """FocalDiceLoss math (src/train_with_focalDice.py:195-235)."""
    bce = F.binary_cross_entropy_with_logits(logits, targets,
                                             reduction="none")
    probs = torch.sigmoid(logits)
    pt = torch.where(targets == 1, probs, 1 - probs)
    focal = (alpha * (1 - pt) ** gamma * bce).mean()
    inter = (probs * targets).sum((2, 3))
    denom = probs.sum((2, 3)) + targets.sum((2, 3))
    dice = 1 - ((2 * inter + smooth) / (denom + smooth)).mean()
    return w_focal * focal + (1 - w_focal) * dice


def _sdf_np(mask01):
    from scipy.ndimage import distance_transform_edt
    m = mask01.astype(bool)
    if m.any() and (~m).any():
        return (distance_transform_edt(~m)
                - distance_transform_edt(m)).astype(np.float32)
    return np.zeros(m.shape, np.float32)


def boundary_torch(logits, targets, bce_weight=0.5, boundary_weight=0.3,
                   t=0.5, w_gt=1.0, w_pred=0.5):
    """CompositeSegLoss math (src/train_with_boundary_loss.py:225-282):
    per-sample CPU scipy SDFs, pred SDF detached."""
    probs = torch.sigmoid(logits)
    B, _, H, W = targets.shape
    scale = max(H, W)
    sdf_gt = torch.stack([
        torch.from_numpy(_sdf_np(targets[b, 0].numpy() > 0.5)) / scale
        for b in range(B)])[:, None]
    with torch.no_grad():
        pred_mask = (probs > t).float()
        sdf_pred = torch.stack([
            torch.from_numpy(_sdf_np(pred_mask[b, 0].numpy() > 0.5)) / scale
            for b in range(B)])[:, None]
    bnd = (w_gt * (probs * sdf_gt).abs().mean()
           + w_pred * ((1.0 - probs) * (-sdf_pred)).abs().mean())
    reg = bce_dice_torch(logits, targets, w=bce_weight)
    return (1 - boundary_weight) * reg + boundary_weight * bnd


def abl_torch_batch(logits, target, max_N_ratio=1 / 100., lb_smooth=0.2,
                    max_clip=20.0):
    """Differentiable batched restatement of the reference ABL
    (src/training/losses/abl.py:32-212) on CPU: per-sample scipy EDT
    distance maps (the *intended* per-sample map — the reference's
    torch.cat in get_dist_maps interleaves one-hot channels across the
    batch for B>1; see cartseg_tpu/losses/abl.py docstring), whole-batch
    adaptive eps vs a per-image max_N budget (abl.py:67-81), neighbor
    KL with detached neighbors (abl.py:137-146), LSSCE(0.2) over 8
    directions weighted by clipped distance (abl.py:205-210).
    Returns None when the predicted boundary is empty (abl.py:201-202).
    logits [B,1,H,W] torch (grad flows); target [B,1,H,W] float 0/1."""
    from scipy.ndimage import distance_transform_edt as sp_edt

    tg = (target[:, 0] > 0.5).long()                    # [B,H,W]
    pf = torch.sigmoid(logits)
    probs = torch.cat([1 - pf, pf], dim=1)              # [B,2,H,W]

    def kl(a, b):
        return F.softmax(b, 1) * (F.log_softmax(b, 1) - F.log_softmax(a, 1))

    # gt boundary (abl.py:89-101)
    ud = F.pad(tg[:, 1:, :] - tg[:, :-1, :], (0, 0, 0, 1)) != 0
    lr = F.pad(tg[:, :, 1:] - tg[:, :, :-1], (0, 1, 0, 0)) != 0
    gtb = (ud | lr)

    # per-sample dist map = max(0, EDT(~boundary) - 1) (abl.py:17-24)
    dists = []
    for b in range(tg.shape[0]):
        m = gtb[b].numpy()
        dists.append(np.maximum(sp_edt(~m) - 1.0, 0.0) if m.any()
                     else np.zeros(m.shape, float))
    dist_map = torch.from_numpy(np.stack(dists)).float()  # [B,H,W]

    # predicted boundary: adaptive eps + 3x3 dilation (abl.py:65-87)
    h, w = logits.shape[2:]
    kl_ud = F.pad(kl(probs[:, :, 1:, :], probs[:, :, :-1, :])
                  .sum(1, keepdim=True), (0, 0, 0, 1))
    kl_lr = F.pad(kl(probs[:, :, :, 1:], probs[:, :, :, :-1])
                  .sum(1, keepdim=True), (0, 1, 0, 0))
    klc = (kl_ud + kl_lr).detach()
    eps, max_N = 1e-5, h * w * max_N_ratio
    while (klc > eps).float().sum() > max_N:
        eps *= 1.2
    binm = (klc > eps).float()
    edge2 = F.conv2d(binm, torch.ones(1, 1, 3, 3), padding=1).squeeze(1)
    pred_bound = edge2 > 0                              # [B,H,W]
    if pred_bound.sum() < 1:
        return None

    nz = torch.nonzero(pred_bound * 1)
    n, x, y = nz.T
    dist_pad = F.pad(dist_map, (1, 1, 1, 1), value=1e5)
    lgt = probs.permute(0, 2, 3, 1)                     # NHWC
    lgt_d = F.pad(lgt, (0, 0, 1, 1, 1, 1))
    lgt_d[:, 0] = lgt_d[:, 1]                           # replicate edges
    lgt_d[:, -1] = lgt_d[:, -2]                         # (abl.py:115-119)
    lgt_d[:, :, 0] = lgt_d[:, :, 1]
    lgt_d[:, :, -1] = lgt_d[:, :, -2]

    x_range = [1, -1, 0, 0, -1, 1, -1, 1, 0]            # abl.py:121-127
    y_range = [0, 0, -1, 1, 1, 1, -1, -1, 0]
    dist_stack, kl_stack = [], []
    center = lgt[(n, x, y)]
    for dx, dy in zip(x_range, y_range):
        dist_stack.append(dist_pad[(n, x + dx + 1, y + dy + 1)])
        if dx != 0 or dy != 0:
            nb = lgt_d[(n, x + dx + 1, y + dy + 1)].detach()
            kl_stack.append((F.softmax(nb, 1)
                             * (F.log_softmax(nb, 1)
                                - F.log_softmax(center, 1))).sum(1))
    dist_stack = torch.stack(dist_stack)                # [9,K]
    kl_stack = torch.stack(kl_stack).T                  # [K,8]
    direction_gt = torch.argmin(dist_stack, dim=0)
    weight = dist_map[(n, x, y)]
    keep = direction_gt != 8
    dgt, dpred = direction_gt[keep], kl_stack[keep]
    weight = torch.clamp(weight[keep], max=max_clip) / max_clip

    # LSSCE V1 math, reduction none (losses/label_smooth.py:14-54)
    C = 8
    oh = torch.full_like(dpred, lb_smooth / C).scatter_(
        1, dgt[:, None], 1 - lb_smooth)
    ce = -(F.log_softmax(dpred, 1) * oh).sum(1)
    return (ce * weight).mean()


def bce_dice_abl_torch(logits, targets, bce_weight=0.5, abl_weight=0.1):
    """BCEDiceABL composite (src/training/train_BCEDice_ABL.py:264-302):
    total = region + 0.1 * ABL, region-only when ABL returns None."""
    region = bce_dice_torch(logits, targets, w=bce_weight)
    boundary = abl_torch_batch(logits, targets)
    return region if boundary is None else region + abl_weight * boundary


def _torch_groups(model):
    enc, dec, head = [], [], []
    for name, p in model.named_parameters():
        (enc if name.startswith("encoder.") else
         head if name.startswith("segmentation_head.") else dec).append(p)
    return enc, dec, head


def _to_t(imgs, masks, mean, std):
    x = (imgs.astype(np.float32) / 255.0 - mean) / std
    x = torch.from_numpy(x).permute(0, 3, 1, 2)
    y = torch.from_numpy(masks.astype(np.float32)).permute(0, 3, 1, 2)
    return x, y


def _soft_dice_t(logits, y, smooth=1.0, eps=1e-7):
    probs = torch.sigmoid(logits)
    inter = (probs * y).sum((2, 3))
    denom = probs.sum((2, 3)) + y.sum((2, 3))
    return ((2 * inter + smooth) / (denom + smooth + eps)).mean().item()


def torch_train(model, loss_fn, train_ds, val_ds, epochs, lr, batch,
                seed=42, imagenet=False, freeze_epochs=0,
                unfreeze_scale=1.0, enc_scale=1.0, head_scale=1.0,
                weight_decay=1e-4, log=print):
    """The reference train loop skeleton (train_bce_dice.py:306-387)
    with the engine's exact per-epoch LR math (schedules.py), so both
    sides see identical group LRs each epoch."""
    mean = IMAGENET_MEAN if imagenet else np.zeros(3, np.float32)
    std = IMAGENET_STD if imagenet else np.ones(3, np.float32)
    enc, dec, head = _torch_groups(model)
    opt = torch.optim.AdamW(
        [{"params": enc, "lr": lr}, {"params": dec, "lr": lr},
         {"params": head, "lr": lr}], lr=lr, weight_decay=weight_decay)

    best = -1.0
    n = len(train_ds)
    for epoch in range(epochs):
        base = lr * (1 + math.cos(math.pi * epoch / epochs)) / 2
        e_on = epoch >= freeze_epochs
        scales = ((enc_scale * unfreeze_scale) if e_on else 0.0,
                  1.0, head_scale)
        for g, s in zip(opt.param_groups, scales):
            g["lr"] = base * s
        for p in enc:
            p.requires_grad_(e_on)
        model.train()
        order = np.random.default_rng(
            np.random.SeedSequence([seed, 7, epoch])).permutation(n)
        for i in range(0, (n // batch) * batch, batch):
            imgs, masks = train_ds.batch(order[i:i + batch])
            x, y = _to_t(imgs, masks, mean, std)
            opt.zero_grad()
            loss_fn(model(x), y).backward()
            opt.step()
        model.eval()
        dices = []
        with torch.no_grad():
            for i in range(0, len(val_ds), batch):
                imgs, masks = val_ds.batch(
                    range(i, min(i + batch, len(val_ds))))
                x, y = _to_t(imgs, masks, mean, std)
                # exact mean: weight each batch by its true size
                dices.append((_soft_dice_t(model(x), y), len(imgs)))
        d = sum(a * b for a, b in dices) / sum(b for _, b in dices)
        best = max(best, d)
        log(f"  torch epoch {epoch + 1}: val dice {d:.4f}")
    return best, model


# -------------------------------------------------------------- jax side

def jax_train(out_dir, init_pth, encoder, loss_spec, epochs, lr, batch,
              img, imagenet=False, freeze_epochs=0, unfreeze_scale=1.0,
              enc_scale=1.0, head_scale=1.0, images_root=None,
              masks_root=None, image_roots=None, log=print, seed=42):
    from cartseg_tpu.train import TrainConfig, Trainer

    cfg = TrainConfig(
        encoder=encoder, img_size=(img, img), batch_size=batch,
        epochs=epochs, lr=lr, patience=epochs + 1, seed=seed,
        loss=loss_spec, augment="none", imagenet_norm=imagenet,
        init_torch_checkpoint=str(init_pth),
        freeze_encoder_epochs=freeze_epochs,
        unfreeze_encoder_lr_scale=unfreeze_scale,
        encoder_lr_scale=enc_scale, head_lr_scale=head_scale,
        images_root=images_root, masks_root=masks_root,
        image_roots=image_roots or [],
        out_dir=str(out_dir))
    res = Trainer(cfg).fit(log=lambda s: log("  jax " + s))
    return res["best_val_dice"], res


# ------------------------------------------------------------- families

def _family_spec(name, img):
    """(encoder, torch loss_fn, jax LossSpec, schedule kwargs)."""
    from cartseg_tpu.train import LossSpec

    if name == "bce_dice":
        return ("resnet34", lambda lg, y: bce_dice_torch(lg, y, w=0.5),
                LossSpec("bce_dice"), {})
    if name == "pretrained":
        return ("efficientnet-b0",
                lambda lg, y: bce_dice_torch(lg, y, w=0.5),
                LossSpec("bce_dice"),
                dict(imagenet=True, freeze_epochs=2, unfreeze_scale=0.3))
    if name == "focal_frozen":
        return ("efficientnet-b0",
                lambda lg, y: focal_dice_torch(lg, y, 0.5, 2.0, 1.0, 0.7),
                LossSpec("focal_dice", {"alpha": 0.5, "gamma": 2.0,
                                        "w_focal": 0.7}),
                dict(imagenet=True, freeze_epochs=2, unfreeze_scale=0.3))
    if name == "focal_unfrozen":
        return ("efficientnet-b0",
                lambda lg, y: focal_dice_torch(lg, y, 0.5, 2.0, 1.0, 0.7),
                LossSpec("focal_dice", {"alpha": 0.5, "gamma": 2.0,
                                        "w_focal": 0.7}),
                dict(imagenet=True, enc_scale=0.1, head_scale=3.0))
    if name == "boundary":
        return ("efficientnet-b0",
                lambda lg, y: boundary_torch(lg, y),
                LossSpec("boundary", {"bce_weight": 0.5,
                                      "boundary_weight": 0.3}),
                dict(imagenet=True, freeze_epochs=2, unfreeze_scale=0.3))
    if name == "abl":
        # src/training/train_BCEDice_ABL.py:354-404 — effnet-b0,
        # ImageNet norm, freeze->unfreeze at LR x 0.3, BCE+Dice+0.1*ABL
        return ("efficientnet-b0",
                lambda lg, y: bce_dice_abl_torch(lg, y),
                LossSpec("bce_dice_abl", {"bce_weight": 0.5,
                                          "abl_weight": 0.1}),
                dict(imagenet=True, freeze_epochs=2, unfreeze_scale=0.3))
    raise ValueError(name)


def run_family(name, datasets, out, epochs, lr, batch, img, log=print,
               seed=42):
    train_ds, val_ds, ir, mr = datasets
    encoder, tloss, jspec, kw = _family_spec(name, img)
    torch.manual_seed(1234 + seed)
    model = SmpUnetTorch(encoder)
    init_pth = out / f"{name}_s{seed}_init.pth"
    torch.save({"model_state_dict": model.state_dict()}, init_pth)

    log(f"[{name}] torch side (seed {seed}):")
    d_torch, _ = torch_train(
        model, tloss, train_ds, val_ds, epochs, lr, batch, seed=seed,
        imagenet=kw.get("imagenet", False),
        freeze_epochs=kw.get("freeze_epochs", 0),
        unfreeze_scale=kw.get("unfreeze_scale", 1.0),
        enc_scale=kw.get("enc_scale", 1.0),
        head_scale=kw.get("head_scale", 1.0), log=log)
    log(f"[{name}] jax side (seed {seed}):")
    d_jax, _ = jax_train(
        out / f"{name}_s{seed}_jax", init_pth, encoder, jspec, epochs,
        lr, batch, img, seed=seed,
        imagenet=kw.get("imagenet", False),
        freeze_epochs=kw.get("freeze_epochs", 0),
        unfreeze_scale=kw.get("unfreeze_scale", 1.0),
        enc_scale=kw.get("enc_scale", 1.0),
        head_scale=kw.get("head_scale", 1.0),
        images_root=str(ir), masks_root=str(mr), log=log)
    delta = (d_jax - d_torch) * 100
    return {"family": name, "seed": seed,
            "torch_best_val_dice": round(d_torch, 4),
            "jax_best_val_dice": round(float(d_jax), 4),
            "delta_points": round(delta, 2),
            "pass": bool(abs(delta) <= 0.5 or d_jax >= d_torch)}


# --------------------------------------------------- pseudo loop family

def _torch_pseudo_label(model, pool_ds, out_masks, mean, std, batch,
                        thr=0.5):
    """Reference pseudo-label QC math on the torch side
    (create_pseudo_labels.py:146-197): fg area, median confidence,
    mean entropy, flip-TTA IoU, Canny(50,150) edge-hit; accepted masks
    written as PNGs mirroring the pool tree."""
    import cv2

    accepted = 0
    model.eval()
    with torch.no_grad():
        for i in range(0, len(pool_ds), batch):
            idx = list(range(i, min(i + batch, len(pool_ds))))
            imgs, _ = pool_ds.batch(idx)
            x, _ = _to_t(imgs, np.zeros_like(imgs[..., :1]), mean, std)
            probs = torch.sigmoid(model(x))[:, 0].numpy()
            probs_f = torch.sigmoid(
                model(torch.flip(x, [3])))[:, 0].numpy()[:, :, ::-1]
            for j, gi in enumerate(idx):
                p = probs[j]
                pred = (p >= thr).astype(np.uint8)
                fg_area = pred.mean()
                fg_conf = np.median(np.abs(p - 0.5) * 2.0)
                pc = np.clip(p, 1e-6, 1 - 1e-6)
                ent = float(-(pc * np.log(pc)
                              + (1 - pc) * np.log(1 - pc)).mean())
                pred_f = (probs_f[j] >= thr).astype(np.uint8)
                union = np.logical_or(pred, pred_f).sum()
                tta = (np.logical_and(pred, pred_f).sum() / union
                       if union else 0.0)
                gray = cv2.cvtColor(imgs[j], cv2.COLOR_RGB2GRAY)
                edges = cv2.Canny(gray, 50, 150)
                cnts, _ = cv2.findContours(pred, cv2.RETR_EXTERNAL,
                                           cv2.CHAIN_APPROX_SIMPLE)
                boundary = np.zeros_like(pred)
                cv2.drawContours(boundary, cnts, -1, 1, 1)
                tot = boundary.sum()
                edge_hit = (((edges > 0) & (boundary > 0)).sum() / tot
                            if tot else 0.0)
                ok = (0.005 <= fg_area <= 0.60 and fg_conf >= 0.65
                      and ent <= 0.35 and tta >= 0.75 and edge_hit >= 0.10)
                if ok:
                    pr = pool_ds.pairs[gi]
                    dst = out_masks / f"{pr.session}_{pr.image.stem}.png"
                    cv2.imwrite(str(dst), pred * 255)
                    accepted += 1
    return accepted


class _FixedDataTrainer:
    """Trainer whose datasets are supplied directly (stage C of the
    pseudo loop trains on labeled+pseudo but validates on the REAL
    labeled val sessions, finetune_pseudo.py:241-244)."""

    def __new__(cls, cfg, train_ds, val_ds):
        from cartseg_tpu.train import Trainer

        t = Trainer(cfg)
        t.build_datasets = lambda: (train_ds, val_ds, None, None)
        return t


def run_pseudo_loop(out, epochs, lr, batch, img, log=print):
    """train -> pseudo-label (QC) -> finetune, both stacks end-to-end."""
    import jax.numpy as jnp

    from cartseg_tpu.data import (make_synthetic_tree, gather_pairs,
                                  session_split, SegmentationDataset)
    from cartseg_tpu.data.pairing import Pair
    from cartseg_tpu.train import LossSpec, TrainConfig, Trainer

    size = (img, img)
    out.mkdir(parents=True, exist_ok=True)
    lab_ir, lab_mr = make_synthetic_tree(out / "lab", n_sessions=5,
                                         per_session=16, hw=(96, 128),
                                         seed=42)
    pool_ir, _ = make_synthetic_tree(out / "pool", n_sessions=4,
                                     per_session=16, hw=(96, 128), seed=77)
    pairs = gather_pairs(lab_ir, lab_mr)
    tr, va = session_split(pairs, 0.2)
    train_pairs = [pairs[i] for i in tr]
    train_ds = SegmentationDataset(train_pairs, size)
    val_ds = SegmentationDataset([pairs[i] for i in va], size)
    pool_imgs = sorted(pool_ir.rglob("*.jpeg"))
    pool_pairs = [Pair(image=p, mask=p, session=p.parent.name)
                  for p in pool_imgs]  # mask unused (inference only)
    pool_ds = SegmentationDataset(pool_pairs, size)

    torch.manual_seed(1234)
    model = SmpUnetTorch("resnet34")
    init_pth = out / "pseudo_init.pth"
    torch.save({"model_state_dict": model.state_dict()}, init_pth)
    mean, std = np.zeros(3, np.float32), np.ones(3, np.float32)

    # ---- stage A: base training
    log("[pseudo_loop] torch stage A:")
    _, model = torch_train(model, lambda lg, y: bce_dice_torch(lg, y, 0.5),
                           train_ds, val_ds, epochs, lr, batch, log=log)
    log("[pseudo_loop] jax stage A:")
    _, res_a = jax_train(out / "jax_a", init_pth, "resnet34",
                         LossSpec("bce_dice"), epochs, lr, batch, img,
                         images_root=str(lab_ir), masks_root=str(lab_mr),
                         log=log)

    # ---- stage B: pseudo-labels with full QC, both stacks
    t_masks = out / "torch_pseudo"
    t_masks.mkdir(parents=True, exist_ok=True)
    n_t = _torch_pseudo_label(model, pool_ds, t_masks, mean, std, batch)
    log(f"[pseudo_loop] torch accepted {n_t}/{len(pool_ds)}")

    from cartseg_tpu.infer import load_member
    from cartseg_tpu.infer.pseudo_labels import (PseudoLabelConfig,
                                                 generate_pseudo_labels)
    member = load_member(Path(res_a["ckpt_dir"]), encoder="resnet34",
                         dtype=jnp.float32)
    j_out = out / "jax_pseudo"
    pcfg = PseudoLabelConfig(
        images_root=str(pool_ir), out_dir=str(j_out), overlay_dir=None,
        img_size=img, imagenet_norm=False, threshold=0.5,
        batch_size=batch, save_probs=False, save_overlays=False)
    stats = generate_pseudo_labels([member], pcfg, log=log)
    n_j = stats.get("accepted", 0)
    log(f"[pseudo_loop] jax accepted {n_j}/{len(pool_ds)}")

    # ---- stage C: finetune on labeled-train + accepted pseudo,
    # validate on the REAL labeled val sessions (both sides)
    def pseudo_pairs(mask_root, flat: bool):
        out_pairs = []
        for p in pool_imgs:
            rel = p.relative_to(pool_ir)
            m = (Path(mask_root) / f"{p.parent.name}_{p.stem}.png") if flat \
                else (Path(mask_root) / rel.parent / f"{p.stem}.png")
            if m.exists():
                out_pairs.append(Pair(image=p, mask=m,
                                      session=p.parent.name))
        return out_pairs

    log("[pseudo_loop] torch stage C:")
    t_ft = SegmentationDataset(train_pairs + pseudo_pairs(t_masks, True),
                               size)
    d_torch, _ = torch_train(model,
                             lambda lg, y: bce_dice_torch(lg, y, 0.5),
                             t_ft, val_ds, max(2, epochs // 2), lr * 0.5,
                             batch, log=log)

    log("[pseudo_loop] jax stage C:")
    j_ft = SegmentationDataset(train_pairs + pseudo_pairs(j_out, False),
                               size)
    cfg_c = TrainConfig(
        encoder="resnet34", img_size=size, batch_size=batch,
        epochs=max(2, epochs // 2), lr=lr * 0.5, patience=epochs + 1,
        seed=42, loss=LossSpec("bce_dice"), augment="none",
        init_checkpoint=res_a["ckpt_dir"], out_dir=str(out / "jax_c"))
    res_c = _FixedDataTrainer(cfg_c, j_ft, val_ds).fit(
        log=lambda s: log("  jax " + s))
    d_jax = res_c["best_val_dice"]

    delta = (float(d_jax) - d_torch) * 100
    return {"family": "pseudo_loop",
            "torch_best_val_dice": round(d_torch, 4),
            "jax_best_val_dice": round(float(d_jax), 4),
            "torch_accepted": int(n_t), "jax_accepted": int(n_j),
            "delta_points": round(delta, 2),
            "pass": bool(abs(delta) <= 0.5 or d_jax >= d_torch)}


ALL_FAMILIES = ("bce_dice", "pretrained", "focal_frozen", "focal_unfrozen",
                "boundary", "abl", "pseudo_loop")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default=",".join(ALL_FAMILIES))
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--img", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--sessions", type=int, default=5)
    ap.add_argument("--per-session", type=int, default=16)
    ap.add_argument("--seeds", default="42",
                    help="comma list; each family runs once per seed")
    ap.add_argument("--out", default="/tmp/parity_families")
    args = ap.parse_args(argv)

    from cartseg_tpu.data import (make_synthetic_tree, gather_pairs,
                                  session_split, SegmentationDataset)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    ir, mr = make_synthetic_tree(out / "synthetic",
                                 n_sessions=args.sessions,
                                 per_session=args.per_session,
                                 hw=(96, 128), seed=42)
    pairs = gather_pairs(ir, mr)
    tr, va = session_split(pairs, 0.2)
    size = (args.img, args.img)
    datasets = (SegmentationDataset([pairs[i] for i in tr], size),
                SegmentationDataset([pairs[i] for i in va], size), ir, mr)

    results = []
    seeds = [int(s) for s in args.seeds.split(",") if s.strip()]
    for fam in args.families.split(","):
        fam = fam.strip()
        if not fam:
            continue
        for seed in seeds:
            if fam == "pseudo_loop":
                r = run_pseudo_loop(out / fam, args.epochs, args.lr,
                                    args.batch, args.img)
            else:
                r = run_family(fam, datasets, out, args.epochs, args.lr,
                               args.batch, args.img, seed=seed)
            print(json.dumps(r))
            results.append(r)
            (out / "parity_families.json").write_text(
                json.dumps(results, indent=1))
    return results


if __name__ == "__main__":
    main()
