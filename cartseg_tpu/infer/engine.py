"""TPU ensemble inference core.

The reference loads up to 3 checkpoints and averages weighted sigmoids
(create_pseudo_labels.py:87-90, 217-223; batched fp16 version
create_pseudo_labels_gpu.py:201-215). Here the ensemble forward, flip
TTA, and every QC statistic run in ONE jitted program per batch — the
host only decodes JPEGs and encodes accepted PNGs (SURVEY.md section
3.3's plan).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from cartseg_tpu.models import build_model, init_model
from cartseg_tpu.train import checkpoint as ckpt_lib
from cartseg_tpu.ops.edges import (sobel_edges, canny_edges,
                                    mask_boundary, rgb_to_gray)


@dataclasses.dataclass
class EnsembleMember:
    model: object
    variables: dict
    weight: float
    threshold: float = 0.5


def load_member(ckpt_dir: Path, encoder: str = "efficientnet-b0",
                weight: float = 1.0,
                dtype=jnp.bfloat16) -> EnsembleMember:
    """Load a flax checkpoint dir (with optional threshold.json sidecar,
    create_pseudo_labels.py:37-41)."""
    model = build_model(encoder, dtype=dtype)
    like = init_model(model, jax.random.key(0), (1, 64, 64, 3))
    tree = ckpt_lib.load_checkpoint(Path(ckpt_dir), {
        "params": like["params"], "batch_stats": like["batch_stats"]})
    thr = ckpt_lib.load_threshold_sidecar(Path(ckpt_dir), default=0.5)
    return EnsembleMember(model, tree, weight, thr)


def load_torch_member(pth_path: Path, encoder: str = "efficientnet-b0",
                      weight: float = 1.0,
                      dtype=jnp.bfloat16) -> EnsembleMember:
    """Load a reference .pth checkpoint directly."""
    import torch
    from cartseg_tpu.models.torch_import import import_smp_unet

    model = build_model(encoder, dtype=dtype)
    sd = torch.load(str(pth_path), map_location="cpu")
    sd = sd.get("model_state_dict", sd)
    variables = import_smp_unet({k: v.numpy() for k, v in sd.items()},
                                encoder)
    import json
    thr_file = Path(pth_path).with_suffix(".threshold.json")
    thr = 0.5
    if thr_file.exists():
        try:
            thr = float(json.loads(thr_file.read_text())["threshold"])
        except Exception:
            pass
    return EnsembleMember(model, variables, weight, thr)


def _ensemble_forward_body(members: Sequence[EnsembleMember], mean, std):
    """Un-jitted weighted sigma-mean forward body shared by
    ensemble_probs_fn and pseudo_label_program."""
    ws = np.asarray([m.weight for m in members], np.float64)
    ws = ws / ws.sum()
    models = [m.model for m in members]
    trees = [m.variables for m in members]
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)

    def forward(images_u8):
        x = (images_u8.astype(jnp.float32) / 255.0 - mean) / std
        probs = 0.0
        for mdl, tree, w in zip(models, trees, ws):
            logits = mdl.apply({"params": tree["params"],
                                "batch_stats": tree["batch_stats"]},
                               x, train=False)
            probs = probs + float(w) * jax.nn.sigmoid(
                logits[..., 0].astype(jnp.float32))
        return probs

    return forward


def _tta_body(forward: Callable) -> Callable:
    def forward_tta(images_u8):
        # one ensemble pass at 2B (originals ++ mirrored) instead of two
        # at B: halves the per-pass overheads and feeds the MXU a bigger
        # batch; measured faster at bs32@512² (docs/BENCHMARKS.md)
        B = images_u8.shape[0]
        both = jnp.concatenate([images_u8, images_u8[:, :, ::-1]], axis=0)
        p = forward(both)
        return p[:B], p[B:][:, :, ::-1]

    return forward_tta


def ensemble_probs_fn(members: Sequence[EnsembleMember],
                      mean, std, tta_flip: bool = False) -> Callable:
    """Returns jitted fn(images_u8 [B,H,W,3]) -> probs [B,H,W] fp32
    (weighted sigma-mean; optionally also the flip-TTA probs)."""
    forward = _ensemble_forward_body(members, mean, std)
    if not tta_flip:
        return jax.jit(forward)
    return jax.jit(_tta_body(forward))


def entropy_map(p, eps: float = 1e-6):
    p = jnp.clip(p, eps, 1.0 - eps)
    return -(p * jnp.log(p) + (1.0 - p) * jnp.log(1.0 - p))


def qc_stats_fn(edge_threshold: float = 120.0,
                edge_method: str = "canny",
                canny_low: float = 50.0,
                canny_high: float = 150.0,
                jit: bool = True) -> Callable:
    """jitted fn(probs, probs_flip, images_u8, threshold) -> dict of
    per-image QC stats [B] matching create_pseudo_labels.py:233-240:
    fg_area, fg_conf (median |p-.5|*2), mean_entropy, tta_iou,
    edge_hit. edge_method='canny' reproduces the reference's
    cv2.Canny(50,150) gate on device (create_pseudo_labels.py:178-189);
    'sobel' is the cheaper single-threshold knob. jit=False returns the
    bare body for inlining into a larger program."""

    def stats(probs, probs_flip, images_u8, threshold):
        from cartseg_tpu.ops.pallas.median import median_nonneg_last_axis

        pred = probs >= threshold
        fg_area = jnp.mean(pred.astype(jnp.float32), axis=(1, 2))
        conf = jnp.abs(probs - 0.5) * 2.0
        B = probs.shape[0]
        # exact np.median; VMEM selection kernel on TPU (23.5 ms of
        # lax.sort at bs64@512^2 -> one read of the data)
        fg_conf = median_nonneg_last_axis(conf.reshape(B, -1))
        mean_ent = jnp.mean(entropy_map(probs), axis=(1, 2))
        pred_f = probs_flip >= threshold
        inter = jnp.sum((pred & pred_f).astype(jnp.float32), axis=(1, 2))
        union = jnp.sum((pred | pred_f).astype(jnp.float32), axis=(1, 2))
        tta_iou = jnp.where(union > 0, inter / jnp.maximum(union, 1), 0.0)

        # batched (not vmapped) so the hysteresis fixpoint dispatches
        # to the whole-batch Pallas reach kernel on TPU
        gray = rgb_to_gray(images_u8.astype(jnp.float32))
        if edge_method == "canny":
            edges = canny_edges(gray, canny_low, canny_high)
        else:
            edges = sobel_edges(gray, edge_threshold)
        boundary = mask_boundary(pred)
        tot = jnp.sum(boundary.astype(jnp.float32), axis=(1, 2))
        hits = jnp.sum((edges & boundary).astype(jnp.float32), axis=(1, 2))
        edge_hit = jnp.where(tot > 0, hits / jnp.maximum(tot, 1), 0.0)
        return {"fg_area": fg_area, "fg_conf": fg_conf,
                "mean_entropy": mean_ent, "tta_iou": tta_iou,
                "edge_hit": edge_hit}

    return jax.jit(stats) if jit else stats


def pseudo_label_program(members: Sequence[EnsembleMember], mean, std,
                         min_area: int,
                         edge_threshold: float = 120.0,
                         edge_method: str = "canny",
                         canny_low: float = 50.0,
                         canny_high: float = 150.0) -> Callable:
    """The whole per-batch pseudo-label computation as ONE jitted
    program: fn(images_u8 [B,H,W,3], threshold) ->
    (pred [B,H,W] bool CC-cleaned, probs [B,H,W] f32, stats dict).

    Fuses what generate_pseudo_labels previously ran as four dispatches
    (ensemble+TTA forward, CC clean, QC stats, cleaned-fg_area refresh)
    into a single XLA executable — on this runtime each dispatch
    carries ~19 ms of fixed host overhead (CLAUDE.md), so at bs64 the
    fusion alone is worth ~3x19 ms per 64 images. Math is identical to
    the separate calls (tests/test_infer.py::test_fused_program_matches).

    fg_area is computed on the CLEANED mask (the reference computes it
    after clean_mask, create_pseudo_labels.py:235); every other stat
    matches qc_stats_fn on the raw thresholded probs.
    """
    from cartseg_tpu.ops.connected_components import remove_small_components

    forward_tta = _tta_body(_ensemble_forward_body(members, mean, std))
    qc = qc_stats_fn(edge_threshold=edge_threshold,
                     edge_method=edge_method, canny_low=canny_low,
                     canny_high=canny_high, jit=False)

    @jax.jit
    def program(images_u8, threshold):
        probs, probs_flip = forward_tta(images_u8)
        # batched directly (ops take [...,H,W]) so the CC dispatch can
        # route the whole batch into the Pallas VMEM fixpoint
        pred = remove_small_components(probs >= threshold, min_area)
        stats = qc(probs, probs_flip, images_u8, threshold)
        stats["fg_area"] = jnp.mean(pred.astype(jnp.float32), axis=(1, 2))
        return pred, probs, stats

    return program
