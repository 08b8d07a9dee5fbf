"""Device Canny vs cv2.Canny calibration (VERDICT r1 item 7).

The reference gates pseudo-label acceptance on a Canny(50,150)
edge-hit rate >= 0.10 (create_pseudo_labels.py:178-189). These tests
measure (a) raw edge-map agreement of ops.edges.canny_edges against
cv2.Canny on a synthetic natural-ish corpus, and (b) — the number that
matters — accept/reject gate agreement of the device edge-hit pipeline
vs the reference cv2 pipeline (Canny + drawContours boundary) over a
corpus of aligned and misaligned masks."""

import numpy as np
import pytest

import jax.numpy as jnp

cv2 = pytest.importorskip("cv2")

from cartseg_tpu.ops.edges import canny_edges, mask_boundary, edge_hit_rate  # noqa: E402


def _synth_image(rng, size=128):
    """Blurred polygon-ish blob on a textured gradient background."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    bg = 90 + 40 * (xx / size) + 25 * np.sin(yy / 9.0)
    img = bg + rng.normal(0, 6.0, (size, size)).astype(np.float32)
    mask = np.zeros((size, size), np.uint8)
    n_pts = rng.integers(3, 7)
    cx, cy = rng.integers(30, size - 30, 2)
    radius = rng.integers(14, 34)
    angles = np.sort(rng.uniform(0, 2 * np.pi, n_pts))
    pts = np.stack([cx + radius * np.cos(angles),
                    cy + radius * np.sin(angles)], 1).astype(np.int32)
    cv2.fillPoly(mask, [pts], 1)
    fg_delta = rng.choice([-70, -50, 55, 80])
    img = img + fg_delta * cv2.GaussianBlur(
        mask.astype(np.float32), (5, 5), 1.2)
    img = np.clip(img, 0, 255)
    rgb = np.stack([img, img, img], -1).astype(np.uint8)
    return rgb, mask


def _ref_edge_hit(rgb, mask01):
    """The reference's exact host pipeline
    (create_pseudo_labels.py:178-189)."""
    gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
    edges = cv2.Canny(gray, 50, 150)
    cnts, _ = cv2.findContours(mask01.astype(np.uint8), cv2.RETR_EXTERNAL,
                               cv2.CHAIN_APPROX_SIMPLE)
    boundary = np.zeros_like(mask01)
    cv2.drawContours(boundary, cnts, -1, 1, thickness=1)
    tot = (boundary > 0).sum()
    return float(((edges > 0) & (boundary > 0)).sum() / tot) if tot else 0.0


def test_canny_edge_map_agreement_vs_cv2(rng):
    """Pixelwise agreement of the device Canny with cv2.Canny on the
    synthetic corpus. NMS tie-breaking differs at plateau pixels, so we
    require high-but-not-bitwise agreement on edge pixels."""
    f1s = []
    for i in range(12):
        rgb, _ = _synth_image(np.random.default_rng(100 + i))
        gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY).astype(np.float32)
        ref = cv2.Canny(gray.astype(np.uint8), 50, 150) > 0
        got = np.asarray(canny_edges(jnp.asarray(gray), 50.0, 150.0))
        tp = float((got & ref).sum())
        prec = tp / max(got.sum(), 1)
        rec = tp / max(ref.sum(), 1)
        f1 = 2 * prec * rec / max(prec + rec, 1e-9)
        f1s.append(f1)
    assert np.mean(f1s) >= 0.75, f"edge-map F1 too low: {np.mean(f1s):.3f}"


def test_edge_hit_gate_agreement_vs_reference(rng):
    """Accept/reject agreement at the 0.10 gate over a corpus of
    aligned masks (should mostly hit) and shifted/wrong masks (should
    mostly miss). Requires >=95% decision agreement (VERDICT r1 #7)."""
    agree, n = 0, 0
    hit_diffs = []
    for i in range(24):
        r = np.random.default_rng(200 + i)
        rgb, mask = _synth_image(r)
        if i % 2 == 1:
            # misaligned mask: random shifted box elsewhere
            mask = np.zeros_like(mask)
            y0, x0 = r.integers(5, 60, 2)
            mask[y0:y0 + 40, x0:x0 + 40] = 1
        ref_hit = _ref_edge_hit(rgb, mask)
        got_hit = float(edge_hit_rate(jnp.asarray(rgb), jnp.asarray(mask),
                                      method="canny"))
        hit_diffs.append(abs(ref_hit - got_hit))
        agree += int((ref_hit >= 0.10) == (got_hit >= 0.10))
        n += 1
    assert agree / n >= 0.95, (
        f"gate agreement {agree}/{n}; mean |d-hit| {np.mean(hit_diffs):.3f}")
    assert np.mean(hit_diffs) < 0.15


def test_canny_hysteresis_connects_weak_chains():
    """A weak-gradient ridge connected to a strong segment must survive
    hysteresis; an isolated weak ridge must not."""
    img = np.zeros((32, 64), np.float32)
    img[:, 32:] = 0.0
    # vertical step edge: strong half then weak half along one column
    img[:16, 20:] = 200.0   # strong contrast rows
    img[16:, 20:] = 30.0    # weak contrast rows (gradient ~ 4*30=120>100?)
    got = np.asarray(canny_edges(jnp.asarray(img), 50.0, 150.0))
    # strong rows produce edges at the step; weak rows connect through
    assert got[:16, 19:21].any()
    assert got[16:, 19:21].any(), "hysteresis did not propagate"
    # isolated weak ridge: same weak contrast, nothing strong anywhere
    img2 = np.zeros((32, 64), np.float32)
    img2[:, 20:] = 30.0
    got2 = np.asarray(canny_edges(jnp.asarray(img2), 50.0, 150.0))
    assert not got2.any(), "isolated weak edge must be suppressed"


def test_canny_batched_matches_per_image(rng=None):
    """canny_edges on a [B,H,W] stack must equal per-image results (the
    fused QC program feeds the whole batch through one call so the
    hysteresis fixpoint can run as one Pallas dispatch on TPU)."""
    r = np.random.default_rng(11)
    imgs = (r.random((4, 48, 64)) * 255).astype(np.float32)
    imgs[1, 10:30, 20:40] += 150.0
    batched = np.asarray(canny_edges(jnp.asarray(imgs), 50.0, 150.0))
    for b in range(imgs.shape[0]):
        single = np.asarray(canny_edges(jnp.asarray(imgs[b]), 50.0, 150.0))
        np.testing.assert_array_equal(batched[b], single)


def test_reach_kernel_matches_dilation_fixpoint():
    """Interpret-mode Pallas hysteresis reachability vs the masked
    dilation while_loop it replaces (bit-identical fixpoints)."""
    from cartseg_tpu.ops.edges import _hysteresis
    from cartseg_tpu.ops.pallas.cc import reach_batch_pallas

    r = np.random.default_rng(5)
    weak = r.random((3, 40, 56)) < 0.45
    strong = weak & (r.random((3, 40, 56)) < 0.15)
    want = np.asarray(_hysteresis(jnp.asarray(weak), jnp.asarray(strong)))
    got = np.asarray(reach_batch_pallas(jnp.asarray(weak),
                                        jnp.asarray(strong)))
    np.testing.assert_array_equal(got, want)
    # seeds outside weak must be ignored
    got2 = np.asarray(reach_batch_pallas(
        jnp.asarray(weak), jnp.asarray(strong | ~weak)))
    np.testing.assert_array_equal(got2, want)
