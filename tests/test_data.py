"""Data layer: pairing/session-split determinism on synthetic disk
trees, mixed-sampler ratios, curriculum schedule, augmentation
statistics, loader round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cartseg_tpu.data import (
    derive_session_key, gather_pairs, gather_pairs_multiroot,
    gather_pairs_mirror, session_split, random_split,
    MixedSource, mixed_sample_weights, WeightedSampler, curriculum_weight,
    SegmentationDataset, make_synthetic_tree,
    AugmentConfig, augment_batch, normalize_batch, Loader,
)
from pathlib import Path


# ------------------------------------------------------------- pairing

def test_derive_session_key():
    assert derive_session_key(Path("raw/store_a1/session_b2/x.jpeg")) \
        == "store_a1/session_b2"
    assert derive_session_key(Path("session_z/x.jpeg")) == "session_z"
    assert derive_session_key(Path("a/b/c/x.jpeg")) == "a/b"
    assert derive_session_key(Path("x.jpeg")) == "x.jpeg"


def test_gather_and_split(tmp_path, rng):
    images_root, masks_root = make_synthetic_tree(tmp_path, n_sessions=5,
                                                  per_session=3)
    pairs = gather_pairs(images_root, masks_root)
    assert len(pairs) == 15
    tr, va = session_split(pairs, val_frac=0.2)
    assert len(tr) + len(va) == 15
    # deterministic: first sorted session -> val
    val_sessions = {pairs[i].session for i in va}
    assert val_sessions == {"session_000"}
    # no leakage
    assert not val_sessions & {pairs[i].session for i in tr}


def test_gather_multiroot_with_store(tmp_path):
    ir, mr = make_synthetic_tree(tmp_path, n_sessions=4, per_session=2,
                                 with_store=True)
    pairs = gather_pairs_multiroot([ir], mr, seed=1337)
    assert len(pairs) == 8
    assert all(p.session.startswith("store_") for p in pairs)
    # deterministic shuffle
    pairs2 = gather_pairs_multiroot([ir], mr, seed=1337)
    assert [p.image for p in pairs] == [p.image for p in pairs2]


def test_gather_mirror(tmp_path):
    ir, mr = make_synthetic_tree(tmp_path, n_sessions=2, per_session=2)
    pairs = gather_pairs_mirror(ir, mr)
    assert len(pairs) == 4


def test_random_split_matches_numpy_semantics():
    tr, va = random_split(100, 0.12, seed=42)
    idx = np.random.RandomState(42).permutation(100)
    assert set(va) == set(idx[:12].tolist())
    assert len(tr) == 88


# ------------------------------------------------------------- sampling

def test_mixed_sampler_ratios():
    sources = [MixedSource("hard", 100, 0.50, 1.0),
               MixedSource("clean", 400, 0.25, 1.0),
               MixedSource("pseudo", 1000, 0.25, 0.4)]
    w = mixed_sample_weights(sources)
    assert len(w) == 1500
    sampler = WeightedSampler(w, num_samples=30000, seed=0)
    idx = sampler.epoch(0)
    src = np.where(idx < 100, 0, np.where(idx < 500, 1, 2))
    frac = np.bincount(src, minlength=3) / len(src)
    np.testing.assert_allclose(frac, [0.5, 0.25, 0.25], atol=0.02)
    # epochs differ but are reproducible
    assert not np.array_equal(sampler.epoch(0), sampler.epoch(1))
    assert np.array_equal(sampler.epoch(1), WeightedSampler(w, 30000, 0).epoch(1))


def test_curriculum_weight():
    ws = [curriculum_weight(e, 0.4, 0.6, 4) for e in range(6)]
    np.testing.assert_allclose(ws, [0.45, 0.5, 0.55, 0.6, 0.6, 0.6], atol=1e-9)


# -------------------------------------------------------------- dataset

def test_dataset_shapes(tmp_path):
    ir, mr = make_synthetic_tree(tmp_path, n_sessions=2, per_session=2)
    ds = SegmentationDataset(gather_pairs(ir, mr), (64, 64))
    img, mask = ds[0]
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert mask.shape == (64, 64) and set(np.unique(mask)) <= {0.0, 1.0}
    imgs, masks = ds.batch([0, 1, 2])
    assert imgs.shape == (3, 64, 64, 3) and masks.shape == (3, 64, 64, 1)


def test_dataset_mask_overlaps_blob(tmp_path):
    """The letterboxed-mask geometry must line up with the letterboxed
    image: the blob painted into the image must sit under the mask."""
    ir, mr = make_synthetic_tree(tmp_path, n_sessions=1, per_session=1,
                                 hw=(96, 128))
    ds = SegmentationDataset(gather_pairs(ir, mr), (64, 64))
    img, mask = ds[0]
    red = (img[..., 0].astype(float) - img[..., 2].astype(float)) > 40
    inter = (red & (mask > 0)).sum()
    assert inter / max(mask.sum(), 1) > 0.6


# --------------------------------------------------------- augmentation

def test_augment_identity_config(rng):
    imgs = rng.integers(0, 255, (2, 32, 32, 3), np.uint8)
    masks = (rng.random((2, 32, 32, 1)) > 0.5).astype(np.float32)
    cfg = AugmentConfig.none()
    out_i, out_m = augment_batch(jax.random.key(0), jnp.asarray(imgs),
                                 jnp.asarray(masks), cfg)
    np.testing.assert_allclose(np.asarray(out_i), imgs / 255.0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_m), masks)


def test_augment_imagenet_norm(rng):
    imgs = rng.integers(0, 255, (1, 8, 8, 3), np.uint8)
    cfg = AugmentConfig.none(imagenet_norm=True)
    out = np.asarray(normalize_batch(jnp.asarray(imgs, jnp.float32),
                                     cfg.mean, cfg.std))
    ref = (imgs / 255.0 - np.array(cfg.mean)) / np.array(cfg.std)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_augment_flip_statistics(rng):
    """hflip p=0.5: over many samples ~half flip; masks follow images."""
    img = np.zeros((1, 8, 8, 3), np.uint8)
    img[0, :, :4] = 255  # left half white
    mask = np.zeros((1, 8, 8, 1), np.float32)
    mask[0, :, :4] = 1.0
    cfg = AugmentConfig(hflip_p=0.5, rotate_p=0, scale_p=0,
                        brightness_contrast_p=0, hsv_p=0, noise_p=0,
                        motion_blur_p=0)
    flips = 0
    N = 200
    imgs = jnp.asarray(np.repeat(img, N, 0))
    masks = jnp.asarray(np.repeat(mask, N, 0))
    oi, om = augment_batch(jax.random.key(1), imgs, masks, cfg)
    oi, om = np.asarray(oi), np.asarray(om)
    for k in range(N):
        flipped = oi[k, 0, 0, 0] < 0.5
        assert flipped == (om[k, 0, 0, 0] < 0.5)  # mask follows image
        flips += flipped
    assert 0.35 < flips / N < 0.65


def test_augment_rotate_preserves_mask_binary(rng):
    imgs = rng.integers(0, 255, (4, 32, 32, 3), np.uint8)
    masks = np.zeros((4, 32, 32, 1), np.float32)
    masks[:, 8:24, 8:24] = 1.0
    cfg = AugmentConfig(hflip_p=0, rotate_p=1.0, rotate_limit=20,
                        scale_p=0, brightness_contrast_p=0, hsv_p=0,
                        noise_p=0, motion_blur_p=0)
    oi, om = augment_batch(jax.random.key(2), jnp.asarray(imgs),
                           jnp.asarray(masks), cfg)
    om = np.asarray(om)
    assert set(np.unique(om)) <= {0.0, 1.0}  # nearest keeps binary
    # area approx preserved under rotation
    assert abs(om.sum() - masks.sum()) / masks.sum() < 0.15


def test_augment_photometric_only_touches_image(rng):
    imgs = rng.integers(0, 255, (4, 16, 16, 3), np.uint8)
    masks = (rng.random((4, 16, 16, 1)) > 0.5).astype(np.float32)
    cfg = AugmentConfig(hflip_p=0, rotate_p=0, scale_p=0,
                        brightness_contrast_p=1.0, hsv_p=1.0,
                        noise_p=1.0, motion_blur_p=1.0)
    oi, om = augment_batch(jax.random.key(3), jnp.asarray(imgs),
                           jnp.asarray(masks), cfg)
    np.testing.assert_array_equal(np.asarray(om), masks)
    assert not np.allclose(np.asarray(oi), imgs / 255.0)


def test_hsv_roundtrip_colorsys_oracle(rng):
    """The sector-free _hsv_to_rgb formula must match the stdlib
    colorsys table conversion exactly (it replaced a 6-way select)."""
    import colorsys

    from cartseg_tpu.data.augment import _rgb_to_hsv, _hsv_to_rgb

    rgb = rng.random((500, 3)).astype(np.float32)
    h, s, v = _rgb_to_hsv(jnp.asarray(rgb))
    back = np.asarray(_hsv_to_rgb(h, s, v))
    np.testing.assert_allclose(back, rgb, atol=2e-6)
    ref = np.array([colorsys.hsv_to_rgb(float(a), float(b), float(c))
                    for a, b, c in zip(np.asarray(h), np.asarray(s),
                                       np.asarray(v))])
    np.testing.assert_allclose(back, ref, atol=2e-6)


def test_augment_jit_compatible(rng):
    imgs = jnp.asarray(rng.integers(0, 255, (2, 16, 16, 3), np.uint8))
    masks = jnp.asarray((rng.random((2, 16, 16, 1)) > 0.5).astype(np.float32))
    cfg = AugmentConfig.train_512()
    f = jax.jit(lambda k, i, m: augment_batch(k, i, m, cfg))
    oi, om = f(jax.random.key(0), imgs, masks)
    assert np.isfinite(np.asarray(oi)).all()


# ----------------------------------------------------------------- loader

def test_loader_roundtrip(tmp_path):
    ir, mr = make_synthetic_tree(tmp_path, n_sessions=2, per_session=4)
    ds = SegmentationDataset(gather_pairs(ir, mr), (32, 32))
    loader = Loader(ds, batch_size=4, num_threads=2)
    batches = list(loader(np.arange(len(ds))))
    assert len(batches) == 2
    imgs, masks = batches[0]
    assert imgs.shape == (4, 32, 32, 3)
    assert masks.shape == (4, 32, 32, 1)


def test_per_sample_warp_differs_across_batch(rng):
    """per_sample_warp=True draws independent geometric params per
    sample (distribution-exact albumentations mode)."""
    img = np.zeros((4, 32, 32, 3), np.uint8)
    img[:, 8:24, 8:24] = 255
    masks = np.zeros((4, 32, 32, 1), np.float32)
    masks[:, 8:24, 8:24] = 1.0
    cfg = AugmentConfig(hflip_p=0, rotate_p=1.0, rotate_limit=30,
                        scale_p=0, brightness_contrast_p=0, hsv_p=0,
                        noise_p=0, motion_blur_p=0, per_sample_warp=True)
    oi, om = augment_batch(jax.random.key(5), jnp.asarray(img),
                           jnp.asarray(masks), cfg)
    om = np.asarray(om)
    # identical inputs, per-sample angles -> outputs differ across batch
    assert not np.array_equal(om[0], om[1]) or \
           not np.array_equal(om[1], om[2])
    assert set(np.unique(om)) <= {0.0, 1.0}
    # shared mode: all outputs identical for identical inputs
    cfg2 = AugmentConfig(hflip_p=0, rotate_p=1.0, rotate_limit=30,
                         scale_p=0, brightness_contrast_p=0, hsv_p=0,
                         noise_p=0, motion_blur_p=0, per_sample_warp=False)
    oi2, om2 = augment_batch(jax.random.key(5), jnp.asarray(img),
                             jnp.asarray(masks), cfg2)
    om2 = np.asarray(om2)
    assert np.array_equal(om2[0], om2[1]) and np.array_equal(om2[1], om2[3])
