"""Inverse letterbox over mask trees + preview overlays — reference
remove_padding_from_masks.py: crop the content region of a (resized)
letterboxed mask and resize back to the original image size (:54-68),
with overlay renders for QC (:227-241, 291-358)."""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from cartseg_tpu import geometry as G


def unpad_mask_to_original(mask: np.ndarray, orig_w: int, orig_h: int,
                           side_padding_ratio: float = 0.1) -> np.ndarray:
    return G.remove_letterbox(mask, orig_w, orig_h, side_padding_ratio)


def make_overlay(rgb: np.ndarray, mask01: np.ndarray,
                 alpha: float = 0.45,
                 color=(255, 0, 0)) -> np.ndarray:
    """Blend a mask tint over the image (remove_padding_from_masks.py:
    227-241)."""
    out = rgb.astype(np.float32).copy()
    m = mask01 > 0
    tint = np.asarray(color, np.float32)
    out[m] = out[m] * (1 - alpha) + tint * alpha
    return out.astype(np.uint8)


def unpad_tree(masks_root: Path, images_root: Path, out_root: Path,
               side_padding_ratio: float = 0.1,
               overlays_root: Optional[Path] = None,
               skip_existing: bool = True, log=print) -> int:
    """For every mask, find the same-rel-path original image, undo the
    letterbox, save at original resolution (+ optional overlays)."""
    import cv2

    masks_root, images_root = Path(masks_root), Path(images_root)
    out_root = Path(out_root)
    n = 0
    for mp in sorted(masks_root.rglob("*.png")):
        rel = mp.relative_to(masks_root)
        out = out_root / rel
        if skip_existing and out.exists():
            continue
        img_path = None
        for ext in (".jpeg", ".jpg", ".png", ".bmp"):
            cand = (images_root / rel).with_suffix(ext)
            if cand.exists():
                img_path = cand
                break
        if img_path is None:
            continue
        img = cv2.imread(str(img_path), cv2.IMREAD_COLOR)
        mask = cv2.imread(str(mp), cv2.IMREAD_GRAYSCALE)
        if img is None or mask is None:
            continue
        oh, ow = img.shape[:2]
        rec = unpad_mask_to_original(mask, ow, oh, side_padding_ratio)
        out.parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(out), rec)
        if overlays_root is not None:
            ov = make_overlay(cv2.cvtColor(img, cv2.COLOR_BGR2RGB),
                              rec > 127)
            op = Path(overlays_root) / rel
            op.parent.mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(op), cv2.cvtColor(ov, cv2.COLOR_RGB2BGR))
        n += 1
    log(f"unpadded {n} masks -> {out_root}")
    return n
