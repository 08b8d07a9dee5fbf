"""Golden-value and round-trip tests for the letterbox geometry.

The oracle is a local re-statement of the reference arithmetic
(train_bce_dice.py:42-85, clean_complete.py:35-65) executed with plain
numpy — every value the geometry module produces must match it exactly.
"""

import numpy as np
import pytest

from cartseg_tpu import geometry as G


def _ref_letterbox(image, ratio=0.1, color=(0, 0, 0)):
    # independent oracle following the published algorithm description
    h, w = image.shape[:2]
    sp = round(w * ratio)
    pw, ph = w + 2 * sp, h
    md = max(pw, ph)
    canvas = np.full((md, md, 3), color, dtype=np.uint8)
    xo, yo = (md - pw) // 2, (md - ph) // 2
    canvas[yo:yo + h, xo + sp:xo + sp + w] = image
    return canvas


@pytest.mark.parametrize("w,h", [(640, 480), (480, 640), (101, 37), (37, 101),
                                 (512, 512), (1, 1), (1920, 1080)])
def test_letterbox_matches_reference_math(w, h, rng):
    img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    ours = G.letterbox_side_pad(img)
    ref = _ref_letterbox(img)
    assert ours.shape == ref.shape
    np.testing.assert_array_equal(ours, ref)


def test_letterbox_is_square_and_content_preserved(rng):
    img = rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
    lb = G.letterbox_side_pad(img)
    spec = G.LetterboxSpec(640, 480)
    x0, y0, x1, y1 = spec.content_box()
    assert lb.shape[0] == lb.shape[1] == spec.max_dim
    np.testing.assert_array_equal(lb[y0:y1, x0:x1], img)
    # padding is the pad color
    assert (lb[:, :x0] == 0).all() and (lb[:, x1:] == 0).all()


def test_letterbox_square_no_side_pad(rng):
    img = rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
    lb = G.letterbox_square(img)
    assert lb.shape == (640, 640, 3)
    np.testing.assert_array_equal(lb[80:560], img)


@pytest.mark.parametrize("w,h,fw,fh", [
    (640, 480, 512, 512), (480, 640, 512, 512),
    (640, 480, 224, 224), (1111, 333, 512, 512),
])
def test_content_boundaries_golden(w, h, fw, fh):
    # oracle: re-derive with explicit arithmetic
    sp = round(w * 0.1)
    pw, ph = w + 2 * sp, h
    md = max(pw, ph)
    xo, yo = (md - pw) // 2, (md - ph) // 2
    x0, y0 = xo + sp, yo
    x1, y1 = x0 + w, y0 + h
    sx, sy = fw / md, fh / md
    exp = (int(round(x0 * sx)), int(round(y0 * sy)),
           int(round(x1 * sx)), int(round(y1 * sy)))
    exp = tuple(max(0, min(m, v)) for v, m in zip(exp, (fw, fh, fw, fh)))
    assert G.calculate_content_boundaries(w, h, fw, fh) == exp


def test_cut_mask_padding_zeroes_outside(rng):
    mask = rng.integers(0, 2, size=(512, 512), dtype=np.uint8) * 255
    cut = G.cut_mask_padding(mask, 640, 480)
    x0, y0, x1, y1 = G.calculate_content_boundaries(640, 480, 512, 512)
    assert (cut[:y0] == 0).all() and (cut[y1:] == 0).all()
    assert (cut[:, :x0] == 0).all() and (cut[:, x1:] == 0).all()
    np.testing.assert_array_equal(cut[y0:y1, x0:x1], mask[y0:y1, x0:x1])


def test_letterbox_unpadding_roundtrip(rng):
    """cut + remove_letterbox(letterboxed mask) recovers the original
    mask geometry: pad -> resize -> unpad == identity on coarse masks."""
    w, h = 640, 480
    orig = np.zeros((h, w), dtype=np.uint8)
    orig[100:300, 200:500] = 255
    # forward: letterbox mask in image space, then resize to 512
    lb = G.letterbox_side_pad(orig[..., None].repeat(3, -1))[:, :, 0]
    import cv2
    small = cv2.resize(lb, (512, 512), interpolation=cv2.INTER_NEAREST)
    # inverse
    rec = G.remove_letterbox(small, w, h)
    assert rec.shape == (h, w)
    inter = ((rec > 127) & (orig > 127)).sum()
    union = ((rec > 127) | (orig > 127)).sum()
    assert inter / union > 0.97  # only resize quantization loss


def test_content_mask_for_matches_boundaries():
    m = np.asarray(G.content_mask_for((512, 512), 640, 480))
    x0, y0, x1, y1 = G.calculate_content_boundaries(640, 480, 512, 512)
    assert m[y0:y1, x0:x1].all()
    assert m.sum() == (y1 - y0) * (x1 - x0)


def test_letterbox_and_resize_shapes(rng):
    img = rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
    out = G.letterbox_and_resize(img, (224, 224))
    assert out.shape == (224, 224, 3)
    mask = rng.integers(0, 2, size=(512, 512), dtype=np.uint8)
    outm = G.letterbox_and_resize(mask, (224, 224), is_mask=True)
    assert outm.shape == (224, 224)
    assert set(np.unique(outm)) <= {0, 1}
