"""Checkpointing: Orbax trees with the reference's best-metric policy
(save on every new best val Dice, train_bce_dice.py:364-374) plus the
`.threshold.json` sidecar consumed by the pseudo-labeler
(create_pseudo_labels.py:37-41), and optional export to a reference-
compatible torch state dict."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from cartseg_tpu.utils.io import write_json, read_json


def save_checkpoint(ckpt_dir: Path, tree: Dict[str, Any],
                    metadata: Optional[Dict[str, Any]] = None):
    """Save {params, batch_stats, opt?...} + metadata.json."""
    ckpt_dir = Path(ckpt_dir).absolute()
    # Under jax.distributed, Orbax's save is a collective: call it from
    # EVERY process (it syncs internally; the primary writes). The
    # plain-file metadata write stays on process 0.
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(ckpt_dir / "tree", tree, force=True)
    if metadata is not None and jax.process_index() == 0:
        write_json(ckpt_dir / "metadata.json", metadata)


def load_checkpoint(ckpt_dir: Path, like: Optional[Dict[str, Any]] = None
                    ) -> Dict[str, Any]:
    ckpt_dir = Path(ckpt_dir).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        if like is not None:
            restore_args = jax.tree_util.tree_map(
                lambda x: ocp.RestoreArgs(restore_type=np.ndarray), like)
            try:
                tree = ckptr.restore(ckpt_dir / "tree",
                                     item=like, restore_args=restore_args)
            except (ValueError, KeyError):
                # structure mismatch (e.g. the checkpoint also carries
                # optimizer state): restore raw and subset
                raw = ckptr.restore(ckpt_dir / "tree")
                tree = {k: raw[k] for k in like}
        else:
            tree = ckptr.restore(ckpt_dir / "tree")
    return tree


def load_metadata(ckpt_dir: Path) -> Dict[str, Any]:
    return read_json(Path(ckpt_dir) / "metadata.json", default={})


def save_threshold_sidecar(ckpt_dir: Path, threshold: float,
                           dice: float, iou: float):
    """<ckpt>/threshold.json — the reference writes
    <ckpt>.threshold.json next to the .pth (finetune_for_224.py:385-388)."""
    write_json(Path(ckpt_dir) / "threshold.json",
               {"threshold": float(threshold), "dice": float(dice),
                "iou": float(iou)})


def load_threshold_sidecar(ckpt_dir: Path, default: float = 0.5) -> float:
    obj = read_json(Path(ckpt_dir) / "threshold.json")
    if obj is None:
        return default
    try:
        return float(obj["threshold"])
    except Exception:
        return default


def export_torch_checkpoint(path: Path, variables: Dict[str, Any],
                            encoder_name: str, epoch: int,
                            val_dice: float, val_iou: float):
    """Write a reference-format .pth dict
    ({epoch, model_state_dict, val_dice, val_iou},
    train_bce_dice.py:368-374) readable by the original tooling."""
    import torch

    from cartseg_tpu.models.torch_import import export_flax_to_torch_naming

    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
          export_flax_to_torch_naming(variables, encoder_name).items()}
    torch.save({"epoch": epoch, "model_state_dict": sd,
                "val_dice": val_dice, "val_iou": val_iou}, str(path))
