"""Host-side dataset: decode -> letterbox -> resize to the training
resolution (the per-sample path of every reference Dataset,
train_bce_dice.py:138-159). Everything stochastic (augmentation,
normalization) happens ON DEVICE in :mod:`cartseg_tpu.data.augment`,
so the host does only decode+geometry — uint8 out, minimal PCIe bytes.

Also provides the synthetic image/mask tree generator used by tests
and benchmarks (the reference has no test data; SURVEY.md section 4
item 4 calls for synthetic disk trees).
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence, Tuple

import numpy as np

from cartseg_tpu import geometry as G
from cartseg_tpu.data.pairing import Pair


class SegmentationDataset:
    """Indexable host dataset over Pair records.

    __getitem__ returns (image_u8 [H,W,3], mask_f32 [H,W] in {0,1}).
    The image is letterboxed (side-pad + square) then resized LINEAR;
    the mask is resized NEAREST without letterboxing (masks were
    created in letterboxed space — train_bce_dice.py:261).
    """

    def __init__(self, pairs: Sequence[Pair], img_size: Tuple[int, int],
                 side_padding_ratio: float = G.SIDE_PADDING_RATIO,
                 letterbox: bool = True,
                 mask_threshold: float = 127.0,
                 use_native: bool = True):
        self.pairs = list(pairs)
        self.img_size = img_size
        self.side_padding_ratio = side_padding_ratio
        self.letterbox = letterbox
        self.mask_threshold = mask_threshold
        if use_native:
            from cartseg_tpu import native
            self._native = native if native.available() else None
        else:
            self._native = None

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, idx: int):
        import cv2

        rec = self.pairs[idx]
        bgr = cv2.imread(str(rec.image), cv2.IMREAD_COLOR)
        if bgr is None:
            raise RuntimeError(f"Could not read image: {rec.image}")
        img = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        if self.letterbox and self._native is not None:
            # fused C++ letterbox+resize: one pass, no temporaries
            img = self._native.letterbox_resize(
                img, self.img_size, self.side_padding_ratio)
        else:
            if self.letterbox:
                img = G.letterbox_side_pad(
                    img, side_padding_ratio=self.side_padding_ratio)
            img = cv2.resize(img, (self.img_size[1], self.img_size[0]),
                             interpolation=cv2.INTER_LINEAR)

        if rec.mask is None:
            mask = np.zeros(self.img_size, np.float32)
        else:
            m = cv2.imread(str(rec.mask), cv2.IMREAD_GRAYSCALE)
            if m is None:
                raise RuntimeError(f"Could not read mask: {rec.mask}")
            m = cv2.resize(m, (self.img_size[1], self.img_size[0]),
                           interpolation=cv2.INTER_NEAREST)
            mask = (m > self.mask_threshold).astype(np.float32)
        return img, mask

    def batch(self, indices: Sequence[int]):
        imgs, masks = zip(*(self[i] for i in indices))
        return np.stack(imgs), np.stack(masks)[..., None]


def make_synthetic_tree(root: Path, n_sessions: int = 3,
                        per_session: int = 4, hw: Tuple[int, int] = (96, 128),
                        seed: int = 0, with_store: bool = False,
                        img_ext: str = ".jpeg") -> Tuple[Path, Path]:
    """Write a tiny images/masks tree with blob masks. Returns
    (images_root, masks_root). Masks are saved in LETTERBOXED space at
    the image's letterboxed resolution, like the reference's mask
    generation pipeline produced them."""
    import cv2

    rng = np.random.default_rng(seed)
    root = Path(root)
    images_root = root / "images"
    masks_root = root / "masks"
    h, w = hw
    for s in range(n_sessions):
        sess = f"session_{s:03d}"
        sub = Path(f"store_{s % 2:02d}") / sess if with_store else Path(sess)
        (images_root / sub).mkdir(parents=True, exist_ok=True)
        (masks_root / sub).mkdir(parents=True, exist_ok=True)
        for k in range(per_session):
            img = rng.integers(0, 255, (h, w, 3), np.uint8)
            cy, cx = rng.integers(h // 4, 3 * h // 4), rng.integers(w // 4, 3 * w // 4)
            r = int(rng.integers(8, min(h, w) // 3))
            yy, xx = np.ogrid[:h, :w]
            blob = ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r)
            img[blob] = (img[blob] * 0.3 + np.array([200, 60, 60]) * 0.7
                         ).astype(np.uint8)
            mask = (blob * 255).astype(np.uint8)
            # letterbox the mask into square space like reference masks
            mask_lb = G.letterbox_side_pad(
                np.repeat(mask[..., None], 3, -1))[:, :, 0]
            name = f"img_{k:03d}"
            cv2.imwrite(str(images_root / sub / f"{name}{img_ext}"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            cv2.imwrite(str(masks_root / sub / f"{name}.png"), mask_lb)
    return images_root, masks_root
