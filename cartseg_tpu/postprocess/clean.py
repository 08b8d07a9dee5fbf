"""Mask cleaners — device-vectorized equivalents of the reference's cv2
loops:

  * clean_mask                  — flood-fill hole filling + keep largest
                                  component (clean_masks.py:12-32)
  * clean_mask_largest_component — largest component only
                                  (remove_blops.py:14-33)
  * post_clean                  — open(3) -> largest CC -> close(7) ->
                                  fill holes <= 0.4% area
                                  (clean_complete.py:93-103)
  * clean_tree                  — the full clean_complete pipeline incl.
                                  cutting mask content outside the
                                  letterbox content box (:35-65), over a
                                  mask tree with skip-existing resume
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from cartseg_tpu import geometry as G
from cartseg_tpu.ops.morphology import (
    morph_open, morph_close, fill_holes_from_border, fill_small_holes,
)
from cartseg_tpu.ops.connected_components import keep_largest_component


@jax.jit
def clean_mask(mask01):
    """HxW bool -> bool: fill all holes, keep largest component."""
    m = fill_holes_from_border(jnp.asarray(mask01, bool))
    return keep_largest_component(m)


@jax.jit
def clean_mask_largest_component(mask01):
    return keep_largest_component(jnp.asarray(mask01, bool))


def post_clean(mask01, open_ks: int = 3, close_ks: int = 7,
               hole_frac: float = 0.004):
    """open -> largest CC -> close -> fill small holes."""
    m = jnp.asarray(mask01, bool)
    if open_ks > 1:
        m = morph_open(m, open_ks)
    m = keep_largest_component(m)
    if close_ks > 1:
        m = morph_close(m, close_ks)
    return fill_small_holes(m, hole_frac)


_post_clean_jit = jax.jit(post_clean, static_argnums=(1, 2, 3))


@dataclasses.dataclass
class CleanConfig:
    masks_root: str = ""
    images_root: Optional[str] = None  # needed for the padding cut
    out_root: Optional[str] = None     # None -> in place
    mode: str = "complete"  # complete | holes_largest | largest_only
    side_padding_ratio: float = 0.1
    open_ks: int = 3
    close_ks: int = 7
    hole_frac: float = 0.004
    skip_existing: bool = False


def clean_tree(cfg: CleanConfig, log=print) -> int:
    """Process every mask under masks_root; returns count processed.
    mode='complete' reproduces clean_complete.py:134-158 (cut padding
    using the original image dims, then post_clean)."""
    import cv2

    masks_root = Path(cfg.masks_root)
    out_root = Path(cfg.out_root) if cfg.out_root else masks_root
    images_root = Path(cfg.images_root) if cfg.images_root else None
    n = 0
    for mp in sorted(masks_root.rglob("*.png")):
        rel = mp.relative_to(masks_root)
        out = out_root / rel
        if cfg.skip_existing and cfg.out_root and out.exists():
            continue
        m = cv2.imread(str(mp), cv2.IMREAD_GRAYSCALE)
        if m is None:
            continue
        m255 = (m > 127).astype(np.uint8) * 255

        if cfg.mode == "complete" and images_root is not None:
            img_path = None
            for ext in (".jpeg", ".jpg", ".png", ".bmp"):
                cand = (images_root / rel).with_suffix(ext)
                if cand.exists():
                    img_path = cand
                    break
            if img_path is not None:
                img = cv2.imread(str(img_path), cv2.IMREAD_COLOR)
                if img is not None:
                    oh, ow = img.shape[:2]
                    m255 = G.cut_mask_padding(m255, ow, oh,
                                              cfg.side_padding_ratio)

        if cfg.mode == "largest_only":
            cleaned = clean_mask_largest_component(m255 > 127)
        elif cfg.mode == "holes_largest":
            cleaned = clean_mask(m255 > 127)
        else:
            cleaned = _post_clean_jit(m255 > 127, cfg.open_ks,
                                      cfg.close_ks, cfg.hole_frac)
        out.parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(out), np.asarray(cleaned).astype(np.uint8) * 255)
        n += 1
    log(f"cleaned {n} masks -> {out_root}")
    return n
