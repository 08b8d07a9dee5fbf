"""Jump-flood EDT vs scipy; morphology / connected components vs cv2."""

import numpy as np
import pytest
import cv2
from scipy import ndimage

import jax.numpy as jnp

from cartseg_tpu.ops import (
    edt, distance_transform_edt,
    erode, dilate, morph_open, morph_close,
    fill_holes_from_border, fill_small_holes,
    connected_components, keep_largest_component,
    remove_small_components, count_components,
    sobel_edges, mask_boundary, edge_hit_rate,
)


def _random_blobs(rng, h=64, w=64, n=4):
    m = np.zeros((h, w), bool)
    for _ in range(n):
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        r = rng.integers(3, 12)
        yy, xx = np.ogrid[:h, :w]
        m |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r ** 2
    return m


# ----------------------------------------------------------------- EDT

@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_edt_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    seeds = rng.random((64, 64)) > 0.97
    if not seeds.any():
        seeds[10, 10] = True
    ours = np.asarray(edt(jnp.asarray(seeds)))
    # scipy: distance to nearest zero of ~seeds == nearest True of seeds
    ref = ndimage.distance_transform_edt(~seeds)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_edt_blobs_matches_scipy(rng):
    m = _random_blobs(rng)
    ours = np.asarray(distance_transform_edt(jnp.asarray(m)))
    ref = ndimage.distance_transform_edt(m)
    # 1+JFA is near-exact; allow rare off-by-tiny pixels
    assert np.abs(ours - ref).max() < 0.5
    assert np.abs(ours - ref).mean() < 0.01


def test_edt_empty_seeds_is_inf():
    d = np.asarray(edt(jnp.zeros((16, 16), bool)))
    assert (d > 1e5).all()


def test_edt_512_shape():
    seeds = np.zeros((512, 512), bool)
    seeds[256, 256] = True
    d = np.asarray(edt(jnp.asarray(seeds)))
    assert d[0, 0] == pytest.approx(np.hypot(256, 256), rel=1e-5)


# ----------------------------------------------------------- morphology

@pytest.mark.parametrize("ks", [3, 5, 7])
def test_erode_dilate_match_cv2(ks, rng):
    m = _random_blobs(rng).astype(np.uint8)
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ks, ks))
    np.testing.assert_array_equal(
        np.asarray(dilate(jnp.asarray(m > 0), ks)).astype(np.uint8),
        cv2.dilate(m, k))
    np.testing.assert_array_equal(
        np.asarray(erode(jnp.asarray(m > 0), ks)).astype(np.uint8),
        cv2.erode(m, k))


def test_open_close_match_cv2(rng):
    m = _random_blobs(rng).astype(np.uint8)
    k3 = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
    k7 = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (7, 7))
    np.testing.assert_array_equal(
        np.asarray(morph_open(jnp.asarray(m > 0), 3)).astype(np.uint8),
        cv2.morphologyEx(m, cv2.MORPH_OPEN, k3))
    np.testing.assert_array_equal(
        np.asarray(morph_close(jnp.asarray(m > 0), 7)).astype(np.uint8),
        cv2.morphologyEx(m, cv2.MORPH_CLOSE, k7))


def test_fill_holes_from_border():
    m = np.zeros((32, 32), bool)
    m[5:25, 5:25] = True
    m[10:15, 10:15] = False  # a hole
    filled = np.asarray(fill_holes_from_border(jnp.asarray(m)))
    assert filled[12, 12]
    assert not filled[0, 0]
    assert filled.sum() == 20 * 20


def test_fill_small_holes_respects_area():
    m = np.ones((40, 40), bool)
    m[0, :] = False  # border-touching bg must never fill
    m[5:7, 5:7] = False       # 4 px hole
    m[20:32, 20:32] = False   # 144 px hole
    out = np.asarray(fill_small_holes(jnp.asarray(m), max_hole_area_frac=0.01))
    assert out[5, 5]            # small hole filled (4 <= 16)
    assert not out[25, 25]      # big hole kept
    assert not out[0, 0]        # border bg kept


# --------------------------------------------------- connected components

def test_count_components_matches_cv2(rng):
    for seed in range(4):
        r = np.random.default_rng(seed)
        m = _random_blobs(r, n=5)
        num, _, _, _ = cv2.connectedComponentsWithStats(
            m.astype(np.uint8), connectivity=8)
        assert int(count_components(jnp.asarray(m))) == num - 1


def test_keep_largest_matches_cv2(rng):
    m = _random_blobs(rng, n=5)
    num, labels, stats, _ = cv2.connectedComponentsWithStats(
        m.astype(np.uint8), connectivity=8)
    if num > 1:
        largest = 1 + np.argmax(stats[1:, cv2.CC_STAT_AREA])
        ref = labels == largest
        ours = np.asarray(keep_largest_component(jnp.asarray(m)))
        np.testing.assert_array_equal(ours, ref)


def test_keep_largest_empty():
    out = np.asarray(keep_largest_component(jnp.zeros((16, 16), bool)))
    assert not out.any()


def test_remove_small_components(rng):
    m = np.zeros((32, 32), bool)
    m[2:4, 2:4] = True      # 4 px
    m[10:20, 10:20] = True  # 100 px
    out = np.asarray(remove_small_components(jnp.asarray(m), min_area=10))
    assert not out[2, 2]
    assert out[15, 15]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_component_area_at_least_matches_general_path(seed):
    """Packed single-operand un-sort == thresholded general area op,
    incl. batched input and cv2-checked via remove_small_components."""
    from cartseg_tpu.ops.connected_components import (
        component_area_at_least, connected_components,
        per_pixel_component_area)

    r = np.random.default_rng(seed)
    m = np.stack([_random_blobs(r, n=6), r.random((64, 64)) < 0.35])
    lab = connected_components(jnp.asarray(m))
    for t in (1, 10, 40):
        got = np.asarray(component_area_at_least(lab, t))
        # bg is always False under the round-5 contract (the general
        # area op still reports the bg-"component" count there)
        want = (np.asarray(per_pixel_component_area(lab)) >= t) & m
        assert (got == want).all()


def _cv2_label_sets(m, connectivity=8):
    num, labels = cv2.connectedComponents(m.astype(np.uint8),
                                          connectivity=connectivity)
    return {frozenset(np.flatnonzero(labels.reshape(-1) == k))
            for k in range(1, num)}


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_labels_partition_matches_cv2(seed):
    """The scan-based propagation must produce cv2's exact partition —
    random noise at several densities exercises thousands of
    components with diagonal-only links."""
    from cartseg_tpu.ops.connected_components import connected_components

    r = np.random.default_rng(seed)
    m = r.random((48, 56)) < (0.2 + 0.1 * seed)
    lab = np.asarray(connected_components(jnp.asarray(m)))
    ours = {frozenset(np.flatnonzero(lab.reshape(-1) == l))
            for l in np.unique(lab[m])}
    assert ours == _cv2_label_sets(m, 8)
    # 4-connectivity lane (cv2.floodFill's spread)
    lab4 = np.asarray(connected_components(jnp.asarray(m),
                                           connectivity=4))
    ours4 = {frozenset(np.flatnonzero(lab4.reshape(-1) == l))
             for l in np.unique(lab4[m])}
    assert ours4 == _cv2_label_sets(m, 4)


def test_labels_spiral_worst_case():
    """A spiral maximizes geodesic turns — the hard case for the
    row/col-scan accelerated propagation's while_loop."""
    from cartseg_tpu.ops.connected_components import connected_components

    n = 33
    m = np.zeros((n, n), bool)
    top, bot, left, right = 0, n - 1, 0, n - 1
    while top <= bot and left <= right:
        m[top, left:right + 1] = True
        m[top:bot + 1, right] = True
        m[bot, left:right + 1] = True
        m[top:bot + 1, left] = True
        top += 2; bot -= 2; left += 2; right -= 2
    # break the rings into ONE spiral arm
    for i, row in enumerate(range(2, n, 2)):
        if i % 2 == 0:
            m[row, 0] = False
        else:
            m[row, n - 1] = False
    assert int(count_components(jnp.asarray(m))) == \
        cv2.connectedComponents(m.astype(np.uint8), connectivity=8)[0] - 1
    lab = np.asarray(connected_components(jnp.asarray(m)))
    ours = {frozenset(np.flatnonzero(lab.reshape(-1) == l))
            for l in np.unique(lab[m])}
    assert ours == _cv2_label_sets(m, 8)


@pytest.mark.parametrize("seed", [0, 1])
def test_per_pixel_component_stats(seed):
    """Sort-based per-pixel area / any-flag reduce vs a numpy oracle."""
    from cartseg_tpu.ops.connected_components import (
        connected_components, per_pixel_component_any,
        per_pixel_component_area)

    r = np.random.default_rng(seed)
    m = _random_blobs(r, n=6)
    lab = np.asarray(connected_components(jnp.asarray(m)))
    area = np.asarray(per_pixel_component_area(jnp.asarray(lab)))
    flags = r.random(m.shape) < 0.01
    anyf = np.asarray(per_pixel_component_any(jnp.asarray(lab),
                                              jnp.asarray(flags)))
    for l in np.unique(lab[m]):
        sel = lab == l
        assert (area[sel] == sel.sum()).all()
        assert (anyf[sel] == flags[sel].any()).all()


# ----------------------------------------------------------------- edges

def test_mask_boundary_is_thin(rng):
    m = np.zeros((32, 32), bool)
    m[8:24, 8:24] = True
    b = np.asarray(mask_boundary(jnp.asarray(m)))
    assert b[8, 8] and b[8, 15] and b[23, 23]
    assert not b[12, 12]
    assert b.sum() == 16 * 4 - 4  # perimeter of a 16x16 square


def test_edge_hit_rate_behaviour(rng):
    # an image with a real intensity edge exactly on the mask boundary
    img = np.zeros((64, 64, 3), np.float32)
    img[:, 32:] = 255.0
    m = np.zeros((64, 64), bool)
    m[:, 32:] = True
    # sobel keeps both columns of a knife edge
    high = float(edge_hit_rate(jnp.asarray(img), jnp.asarray(m),
                               method="sobel"))
    # canny NMS keeps only ONE column of a synthetic 1px knife edge
    # (exactly like cv2 — its tie-break keeps the dark side, missing
    # the inner mask boundary); a realistically blurred edge spans the
    # boundary and hits. Make a 2px-ramp edge:
    # (asymmetric ramp so the gradient maximum — the surviving NMS
    # column — is exactly the inner-boundary column 32)
    img_blur = np.zeros((64, 64, 3), np.float32)
    img_blur[:, 31] = 40.0
    img_blur[:, 32] = 200.0
    img_blur[:, 33:] = 255.0
    high_canny = float(edge_hit_rate(jnp.asarray(img_blur), jnp.asarray(m),
                                     method="canny"))
    # same mask on a flat image -> no edges to hit (both methods)
    low = float(edge_hit_rate(jnp.zeros((64, 64, 3)), jnp.asarray(m),
                              method="sobel"))
    low_canny = float(edge_hit_rate(jnp.zeros((64, 64, 3)),
                                    jnp.asarray(m), method="canny"))
    assert high > 0.4
    assert high_canny > 0.4
    assert low == 0.0 and low_canny == 0.0


def test_sobel_edges_on_step():
    img = np.zeros((32, 32), np.float32)
    img[:, 16:] = 255.0
    e = np.asarray(sobel_edges(jnp.asarray(img)))
    assert e[:, 15:17].any()
    assert not e[:, :10].any()


# ------------------------------------------------- Pallas VMEM flood

def test_edt_batch_pallas_matches_xla_lane():
    """The VMEM-resident Pallas flood (interpret mode here; compiled in
    tools/run_chip_parity.py) must agree with the vmapped XLA JFA on
    every pixel, including a no-seed sample (sentinel sqrt(1e12))."""
    import jax

    from cartseg_tpu.ops.pallas.edt import edt_batch_pallas

    rng = np.random.default_rng(0)
    seeds = rng.random((3, 48, 64)) > 0.97
    seeds[2] = False  # no-seed sample -> sentinel
    ours = np.asarray(edt_batch_pallas(jnp.asarray(seeds)))
    ref = np.asarray(jax.vmap(edt)(jnp.asarray(seeds)))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_edt_batch_pallas_under_sharded_pjit():
    """The multi-chip ABL/boundary path jits the loss (and its EDT)
    over a data-sharded mesh: the Pallas flood's per-sample grid must
    survive pjit batch sharding (canary for the TPU DP train step; the
    escape hatch is CARTSEG_PALLAS_EDT=0 -> XLA lane)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from cartseg_tpu.ops.pallas.edt import edt_batch_pallas

    mesh = Mesh(np.array(jax.devices()), ("data",))
    sh = NamedSharding(mesh, P("data"))
    rng = np.random.default_rng(3)
    seeds = rng.random((16, 48, 64)) > 0.97
    x = jax.device_put(jnp.asarray(seeds, jnp.float32), sh)
    out = np.asarray(jax.jit(edt_batch_pallas, in_shardings=sh,
                             out_shardings=sh)(x))
    ref = np.asarray(jax.vmap(edt)(jnp.asarray(seeds)))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_cc_batch_pallas_matches_xla_lane():
    """The VMEM-resident Pallas CC fixpoint (interpret mode here;
    compiled in tools/run_chip_parity.py) must produce the XLA sweep
    loop's exact labels — min flat index per component, size on bg —
    at both connectivities, including an all-bg sample."""
    from cartseg_tpu.ops.pallas.cc import cc_batch_pallas
    from cartseg_tpu.ops.connected_components import connected_components
    import os

    rng = np.random.default_rng(0)
    m = rng.random((3, 48, 64)) < 0.45
    m[2] = False
    for conn in (8, 4):
        ours = np.asarray(cc_batch_pallas(jnp.asarray(m),
                                          connectivity=conn))
        old = os.environ.get("CARTSEG_PALLAS_CC")
        os.environ["CARTSEG_PALLAS_CC"] = "0"
        try:
            ref = np.asarray(connected_components(jnp.asarray(m),
                                                  connectivity=conn))
        finally:
            if old is None:
                os.environ.pop("CARTSEG_PALLAS_CC")
            else:
                os.environ["CARTSEG_PALLAS_CC"] = old
        assert (ours == ref).all()


def test_cc_ladder_lane_matches_plain():
    """The bit-packed run-mask ladder lane (default since round 5,
    docs/cc_ladder_bench.json) must be bit-identical to the
    recompute-in-sweep lane for cc AND reach at both connectivities."""
    from cartseg_tpu.ops.pallas.cc import (cc_batch_pallas,
                                           reach_batch_pallas)

    rng = np.random.default_rng(7)
    m = rng.random((3, 48, 64)) < 0.45
    m[2] = False
    for conn in (8, 4):
        a = np.asarray(cc_batch_pallas(jnp.asarray(m), connectivity=conn,
                                       ladder=False))
        b = np.asarray(cc_batch_pallas(jnp.asarray(m), connectivity=conn,
                                       ladder=True))
        assert (a == b).all()
    weak = rng.random((3, 48, 64)) < 0.5
    strong = weak & (rng.random((3, 48, 64)) < 0.1)
    a = np.asarray(reach_batch_pallas(jnp.asarray(weak),
                                      jnp.asarray(strong), ladder=False))
    b = np.asarray(reach_batch_pallas(jnp.asarray(weak),
                                      jnp.asarray(strong), ladder=True))
    assert (a == b).all()


def test_cc_batch_pallas_under_sharded_pjit():
    """The pseudo-label program jits CC over data-sharded batches on a
    mesh: the Pallas fixpoint's per-sample grid must survive pjit batch
    sharding (escape hatch: CARTSEG_PALLAS_CC=0 -> XLA lane)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from cartseg_tpu.ops.pallas.cc import cc_batch_pallas
    from cartseg_tpu.ops.connected_components import connected_components

    mesh = Mesh(np.array(jax.devices()), ("data",))
    sh = NamedSharding(mesh, P("data"))
    rng = np.random.default_rng(3)
    m = rng.random((16, 48, 64)) < 0.45
    x = jax.device_put(jnp.asarray(m), sh)
    out = np.asarray(jax.jit(
        lambda v: cc_batch_pallas(v), in_shardings=sh,
        out_shardings=sh)(x))
    ref = np.asarray(connected_components(jnp.asarray(m)))
    assert (out == ref).all()


def test_edt_batch_dispatch_cpu_lane():
    """Off-TPU, edt_batch routes to the XLA lane and matches scipy."""
    from cartseg_tpu.ops.edt import edt_batch

    rng = np.random.default_rng(1)
    seeds = rng.random((2, 40, 56)) > 0.95
    out = np.asarray(edt_batch(jnp.asarray(seeds)))
    for b in range(2):
        ref = ndimage.distance_transform_edt(~seeds[b])
        assert np.abs(out[b] - ref).max() < 0.51  # 1+JFA near-exactness
