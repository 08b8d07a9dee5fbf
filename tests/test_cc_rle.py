"""Parity of the RLE (run-table) component-stats lane vs the
full-plane pixel-sort oracle (ops/cc_stats_rle.py vs the
_pixel_sort_* lanes in ops/connected_components.py), including the
lax.cond fallback on masks that overflow the per-row run budget."""

import numpy as np
import pytest

import jax.numpy as jnp

from cartseg_tpu.ops.connected_components import (
    component_area_at_least, connected_components, keep_largest_component,
    per_pixel_component_area, remove_small_components,
    _pixel_sort_area_at_least, _pixel_sort_largest)
from cartseg_tpu.ops.cc_stats_rle import (
    max_runs_per_row, rle_area_at_least, rle_area_plane,
    rle_largest_label, rle_fits)


def _oracle_area_at_least(lab, t):
    """Pixel-sort lane masked to fg — the public contract (bg False)."""
    lab = jnp.asarray(lab)
    size = lab.shape[-2] * lab.shape[-1]
    return np.asarray(_pixel_sort_area_at_least(lab, t)) & (
        np.asarray(lab) < size)


def _blobs(rng, h, w, p=0.55, smooth=2):
    x = rng.random((h, w))
    for _ in range(smooth):
        x = (x + np.roll(x, 1, 0) + np.roll(x, -1, 0)
             + np.roll(x, 1, 1) + np.roll(x, -1, 1)) / 5.0
    return x > np.quantile(x, p)


MASKS = {
    "empty": np.zeros((24, 40), bool),
    "full": np.ones((24, 40), bool),
    "single": np.eye(16, dtype=bool) * False,
    "pixel": np.zeros((9, 13), bool),
    "checker": (np.indices((20, 36)).sum(0) % 2).astype(bool),
    "stripes": np.tile(np.array([True, False]), (30, 16)),
}
MASKS["pixel"][4, 7] = True
_spiral = np.zeros((32, 32), bool)
_spiral[2, 2:30] = True
_spiral[2:30, 29] = True
_spiral[29, 4:30] = True
_spiral[6:30, 4] = True
_spiral[6, 4:26] = True
_spiral[6:26, 25] = True
MASKS["spiral"] = _spiral


@pytest.mark.parametrize("name", sorted(MASKS))
def test_area_at_least_matches_oracle(name):
    mask = MASKS[name]
    lab = connected_components(jnp.asarray(mask))
    for t in (1, 2, 5, 50, 10_000):
        want = _oracle_area_at_least(lab, t)
        got = np.asarray(component_area_at_least(lab, t, rle_k=8))
        np.testing.assert_array_equal(got, want, err_msg=f"{name} t={t}")


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("hw", [(24, 40), (7, 33), (64, 64)])
def test_area_at_least_random(seed, hw):
    rng = np.random.default_rng(seed)
    mask = _blobs(rng, *hw)
    lab = connected_components(jnp.asarray(mask))
    for t in (1, 3, 17, hw[0] * hw[1]):
        want = _oracle_area_at_least(lab, t)
        got = np.asarray(component_area_at_least(lab, t, rle_k=16))
        np.testing.assert_array_equal(got, want)


def test_rle_direct_no_fallback_exact_when_k_large():
    # checkerboard overflows small K but is exact at K = W/2 (the true
    # per-row maximum) WITHOUT the cond fallback
    mask = MASKS["checker"]
    lab = connected_components(jnp.asarray(mask))
    assert int(max_runs_per_row(lab, mask.size)) == 18
    got = np.asarray(rle_area_at_least(lab, 2, K=18)).astype(bool)
    want = _oracle_area_at_least(lab, 2)
    np.testing.assert_array_equal(got, want)


def test_rle_area_plane_matches_per_pixel_area():
    rng = np.random.default_rng(7)
    mask = _blobs(rng, 48, 56)
    lab = connected_components(jnp.asarray(mask))
    got = np.asarray(rle_area_plane(lab, K=28))
    want = np.where(mask, np.asarray(per_pixel_component_area(lab)), 0)
    np.testing.assert_array_equal(got, want)


def test_batched_matches_unbatched():
    rng = np.random.default_rng(3)
    masks = np.stack([_blobs(rng, 24, 40) for _ in range(4)])
    lab = connected_components(jnp.asarray(masks))
    got = np.asarray(component_area_at_least(lab, 9, rle_k=20))
    for b in range(4):
        lab1 = connected_components(jnp.asarray(masks[b]))
        want = _oracle_area_at_least(lab1, 9)
        np.testing.assert_array_equal(got[b], want)


def test_remove_small_components_end_to_end():
    rng = np.random.default_rng(11)
    mask = _blobs(rng, 40, 40, p=0.6)
    got = np.asarray(remove_small_components(jnp.asarray(mask), 12))
    # oracle: pure numpy flood count
    from scipy import ndimage
    lab, n = ndimage.label(mask, structure=np.ones((3, 3)))
    keep = np.zeros_like(mask)
    for i in range(1, n + 1):
        comp = lab == i
        if comp.sum() >= 12:
            keep |= comp
    np.testing.assert_array_equal(got, keep)


@pytest.mark.parametrize("name", ["empty", "checker", "spiral"])
def test_keep_largest_matches_oracle(name):
    mask = MASKS[name]
    got = np.asarray(keep_largest_component(jnp.asarray(mask), rle_k=6))
    lab = connected_components(jnp.asarray(mask))
    want = np.asarray(_pixel_sort_largest(
        jnp.asarray(mask), lab, mask.size))
    np.testing.assert_array_equal(got, want)


def test_keep_largest_random_and_ties():
    rng = np.random.default_rng(5)
    for _ in range(3):
        mask = _blobs(rng, 32, 48, p=0.65)
        got = np.asarray(keep_largest_component(jnp.asarray(mask),
                                                rle_k=24))
        lab = connected_components(jnp.asarray(mask))
        want = np.asarray(_pixel_sort_largest(
            jnp.asarray(mask), lab, mask.size))
        np.testing.assert_array_equal(got, want)
    # exact tie: two 2x2 squares -> cv2 keeps the first (min label)
    tie = np.zeros((10, 10), bool)
    tie[1:3, 1:3] = True
    tie[6:8, 6:8] = True
    got = np.asarray(keep_largest_component(jnp.asarray(tie), rle_k=4))
    want = np.zeros_like(tie)
    want[1:3, 1:3] = True
    np.testing.assert_array_equal(got, want)


def test_rle_largest_label_batched():
    rng = np.random.default_rng(9)
    masks = np.stack([_blobs(rng, 24, 32, p=0.7) for _ in range(3)])
    lab = connected_components(jnp.asarray(masks))
    bl, ba = rle_largest_label(lab, K=16)
    assert bl.shape == (3,) and ba.shape == (3,)
    for b in range(3):
        lab1 = np.asarray(connected_components(jnp.asarray(masks[b])))
        area1 = np.asarray(per_pixel_component_area(jnp.asarray(lab1)))
        area1 = np.where(masks[b], area1, 0)
        assert int(ba[b]) == int(area1.max())
        if area1.max() > 0:
            tied = (area1 == area1.max()) & masks[b]
            assert int(bl[b]) == int(lab1[tied].min())


def test_rle_fits_guards():
    assert rle_fits(512, 512, 64)
    assert rle_fits(224, 224, 64)
    # 1024^2: label*2^bits_x packing hits 2^31 — correctly refuses (the
    # public ops fall back to the pixel-sort lane there)
    assert not rle_fits(1024, 1024, 64)
    assert not rle_fits(40_000, 40_000, 64)
