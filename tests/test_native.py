"""Native C++ host runtime: exact EDT vs scipy, fused letterbox+resize
vs the cv2 reference path. Skipped cleanly when no toolchain exists."""

import numpy as np
import pytest

from cartseg_tpu import native
from cartseg_tpu import geometry as G

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


def test_edt_exact_matches_scipy(rng):
    from scipy import ndimage
    for seed in range(3):
        r = np.random.default_rng(seed)
        seeds = r.random((96, 128)) > 0.98
        seeds[0, 0] = True  # guarantee one seed
        ours = native.edt_exact(seeds)
        ref = ndimage.distance_transform_edt(~seeds)
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_distance_transform_scipy_semantics(rng):
    from scipy import ndimage
    m = np.zeros((64, 64), bool)
    m[10:40, 20:50] = True
    ours = native.distance_transform_edt(m)
    ref = ndimage.distance_transform_edt(m)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_letterbox_resize_matches_cv2_path(rng):
    import cv2
    img = rng.integers(0, 255, (480, 640, 3), np.uint8)
    ours = native.letterbox_resize(img, (512, 512))
    ref = G.letterbox_and_resize(img, (512, 512))
    diff = np.abs(ours.astype(int) - ref.astype(int))
    # cv2 uses fixed-point bilinear; float math may differ by 1 LSB on
    # a small fraction of pixels
    assert np.mean(diff <= 1) > 0.995
    assert diff.max() <= 3


def test_resize_nearest_matches_cv2(rng):
    import cv2
    m = rng.integers(0, 2, (480, 640), np.uint8) * 255
    ours = native.resize_nearest(m, (224, 224))
    ref = cv2.resize(m, (224, 224), interpolation=cv2.INTER_NEAREST)
    assert (ours == ref).mean() > 0.99


def test_letterbox_geometry_exact(rng):
    """Padding region must be exactly the pad color and the content box
    must match the integer geometry."""
    img = np.full((480, 640, 3), 200, np.uint8)
    out = native.letterbox_resize(img, (512, 512), pad=(7, 8, 9))
    x0, y0, x1, y1 = G.calculate_content_boundaries(640, 480, 512, 512)
    # strictly inside the padding (1px margin from the boundary blend)
    assert tuple(out[0, 0]) == (7, 8, 9)
    assert tuple(out[y0 - 2, 256]) == (7, 8, 9) if y0 >= 2 else True
    # strictly inside the content
    assert (np.abs(out[y0 + 2:y1 - 2, x0 + 2:x1 - 2].astype(int) - 200)
            <= 1).all()
