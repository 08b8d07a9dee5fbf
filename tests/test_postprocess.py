"""Mask post-processing vs cv2 oracles + tree-level tools."""

import numpy as np
import cv2
import pytest

import jax.numpy as jnp

from cartseg_tpu.postprocess import (
    clean_mask, clean_mask_largest_component, post_clean,
    clean_tree, CleanConfig, unpad_mask_to_original, unpad_tree,
    make_overlay, copy_matching_images, copy_masks,
)
from cartseg_tpu import geometry as G


def _blobby(rng, h=48, w=48):
    m = np.zeros((h, w), np.uint8)
    m[8:30, 8:30] = 1
    m[12:16, 12:16] = 0            # hole
    m[40:44, 40:44] = 1            # small separate blob
    return m


def cv2_clean_mask(m01):
    # flood-fill holes + largest component (clean_masks.py:12-32 intent)
    m = (m01 > 0).astype(np.uint8)
    ff = m.copy()
    pad = np.zeros((m.shape[0] + 2, m.shape[1] + 2), np.uint8)
    cv2.floodFill(ff, pad, (0, 0), 1)
    filled = m | (1 - ff)
    num, labels, stats, _ = cv2.connectedComponentsWithStats(filled, 8)
    if num <= 1:
        return filled
    largest = 1 + np.argmax(stats[1:, cv2.CC_STAT_AREA])
    return (labels == largest).astype(np.uint8)


def test_clean_mask_matches_cv2(rng):
    m = _blobby(rng)
    ours = np.asarray(clean_mask(jnp.asarray(m > 0))).astype(np.uint8)
    ref = cv2_clean_mask(m)
    np.testing.assert_array_equal(ours, ref)
    assert ours[13, 13] == 1      # hole filled
    assert ours[41, 41] == 0      # small blob removed


def test_largest_component_only(rng):
    m = _blobby(rng)
    ours = np.asarray(clean_mask_largest_component(jnp.asarray(m > 0)))
    assert ours[20, 20] and not ours[41, 41]
    assert not ours[13, 13]  # hole NOT filled in this mode


def test_post_clean_matches_cv2_sequence(rng):
    m = _blobby(rng) * 255
    ours = np.asarray(post_clean(jnp.asarray(m > 127), 3, 7, 0.004))
    # cv2 oracle (clean_complete.py:93-103)
    mm = (m > 127).astype(np.uint8) * 255
    k3 = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
    k7 = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (7, 7))
    r = cv2.morphologyEx(mm, cv2.MORPH_OPEN, k3)
    num, labels, stats, _ = cv2.connectedComponentsWithStats(
        (r > 127).astype(np.uint8), 8)
    if num > 1:
        largest = 1 + np.argmax(stats[1:, cv2.CC_STAT_AREA])
        r = (labels == largest).astype(np.uint8) * 255
    r = cv2.morphologyEx(r, cv2.MORPH_CLOSE, k7)
    # fill small holes
    inv = 255 - r
    H, W = r.shape
    max_area = int(H * W * 0.004)
    num, labels, stats, _ = cv2.connectedComponentsWithStats(inv, 8)
    filled = r.copy()
    for i in range(1, num):
        x, y, w, h, area = stats[i]
        if (x == 0) or (y == 0) or (x + w == W) or (y + h == H):
            continue
        if area <= max_area:
            filled[labels == i] = 255
    np.testing.assert_array_equal(ours.astype(np.uint8) * 255, filled)


def test_clean_tree_complete_cuts_padding(tmp_path, rng):
    # build one image + an all-ones mask; the content cut must zero the
    # letterbox padding region
    img = rng.integers(0, 255, (48, 64, 3), np.uint8)
    (tmp_path / "images" / "s").mkdir(parents=True)
    (tmp_path / "masks" / "s").mkdir(parents=True)
    cv2.imwrite(str(tmp_path / "images" / "s" / "a.jpeg"), img)
    mask = np.full((64, 64), 255, np.uint8)  # letterboxed square canvas
    cv2.imwrite(str(tmp_path / "masks" / "s" / "a.png"), mask)
    clean_tree(CleanConfig(
        masks_root=str(tmp_path / "masks"),
        images_root=str(tmp_path / "images"),
        out_root=str(tmp_path / "out"), mode="complete",
        open_ks=1, close_ks=1), log=lambda *a: None)
    out = cv2.imread(str(tmp_path / "out" / "s" / "a.png"),
                     cv2.IMREAD_GRAYSCALE)
    x0, y0, x1, y1 = G.calculate_content_boundaries(64, 48, 64, 64)
    assert (out[y0:y1, x0:x1] > 0).all()
    assert (out[:y0] == 0).all() and (out[y1:] == 0).all()
    assert (out[:, :x0] == 0).all() and (out[:, x1:] == 0).all()


def test_unpad_tree_roundtrip(tmp_path):
    w, h = 64, 48
    orig = np.zeros((h, w), np.uint8)
    orig[10:40, 20:50] = 255
    img = np.zeros((h, w, 3), np.uint8)
    (tmp_path / "images" / "s").mkdir(parents=True)
    (tmp_path / "masks" / "s").mkdir(parents=True)
    cv2.imwrite(str(tmp_path / "images" / "s" / "a.jpeg"), img)
    lb = G.letterbox_side_pad(np.repeat(orig[..., None], 3, -1))[:, :, 0]
    small = cv2.resize(lb, (32, 32), interpolation=cv2.INTER_NEAREST)
    cv2.imwrite(str(tmp_path / "masks" / "s" / "a.png"), small)
    n = unpad_tree(tmp_path / "masks", tmp_path / "images",
                   tmp_path / "out", overlays_root=tmp_path / "ov",
                   log=lambda *a: None)
    assert n == 1
    rec = cv2.imread(str(tmp_path / "out" / "s" / "a.png"),
                     cv2.IMREAD_GRAYSCALE)
    assert rec.shape == (h, w)
    inter = ((rec > 127) & (orig > 127)).sum()
    union = ((rec > 127) | (orig > 127)).sum()
    assert inter / union > 0.85  # 32->64 quantization tolerated
    assert (tmp_path / "ov" / "s" / "a.png").exists()


def test_make_overlay_tints_mask(rng):
    img = np.zeros((8, 8, 3), np.uint8)
    m = np.zeros((8, 8), bool)
    m[2:4, 2:4] = True
    ov = make_overlay(img, m)
    assert ov[2, 2, 0] > 100 and ov[0, 0, 0] == 0


def test_plumbing_copy(tmp_path, rng):
    (tmp_path / "imgs" / "s").mkdir(parents=True)
    (tmp_path / "masks" / "s").mkdir(parents=True)
    img = rng.integers(0, 255, (8, 8, 3), np.uint8)
    cv2.imwrite(str(tmp_path / "imgs" / "s" / "x.JPEG"), img)  # odd case
    cv2.imwrite(str(tmp_path / "masks" / "s" / "x.png"),
                np.zeros((8, 8), np.uint8))
    cv2.imwrite(str(tmp_path / "masks" / "s" / "y_overlay_512.png"),
                np.zeros((8, 8), np.uint8))
    n = copy_matching_images(tmp_path / "masks", tmp_path / "imgs",
                             tmp_path / "outi", log=lambda *a: None)
    assert n == 1
    n = copy_masks(tmp_path / "masks", tmp_path / "outm",
                   log=lambda *a: None)
    assert n == 1  # overlay excluded
