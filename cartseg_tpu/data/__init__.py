"""Data layer: host-side file pairing / session splits / weighted mixed
sampling (pure-Python, deterministic, seeded) and the on-device
jit-compiled augmentation pipeline that replaces albumentations
(SURVEY.md section 2.6)."""

from cartseg_tpu.data.pairing import (
    derive_session_key, gather_pairs, gather_pairs_multiroot,
    gather_pairs_mirror, session_split, random_split,
)
from cartseg_tpu.data.sampling import (
    MixedSource, mixed_sample_weights, WeightedSampler,
    curriculum_weight,
)
from cartseg_tpu.data.dataset import SegmentationDataset, make_synthetic_tree
from cartseg_tpu.data.augment import (AugmentConfig, augment_batch,
                                      normalize_batch, draw_warp_params)
from cartseg_tpu.data.pipeline import Loader

__all__ = [
    "derive_session_key", "gather_pairs", "gather_pairs_multiroot",
    "gather_pairs_mirror", "session_split", "random_split",
    "MixedSource", "mixed_sample_weights", "WeightedSampler",
    "curriculum_weight",
    "SegmentationDataset", "make_synthetic_tree",
    "AugmentConfig", "augment_batch", "normalize_batch",
    "draw_warp_params",
    "Loader",
]
