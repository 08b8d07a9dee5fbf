"""Annotation tooling, headless parts: seg_friendly, smooth/fill ops,
session state machine (with a fake SAM), prefetch worker, candidate
loading, skip markers, save paths."""

import threading
import numpy as np
import cv2
import pytest

from pathlib import Path

from cartseg_tpu.tools.annotate import (
    seg_friendly, smooth_mask, fill_holes,
    AnnotationSession, PrefetchWorker, PrefetchItem,
    load_hard_candidates, pending_paths, write_skip_marker, load_sam,
)
from cartseg_tpu import geometry as G


class FakeSam:
    """Predictor stub: returns a fixed box/point blob."""

    def predict(self, point_coords=None, point_labels=None, box=None,
                multimask_output=False):
        m = np.zeros((64, 64), bool)
        if box is not None:
            x0, y0, x1, y1 = box
            m[y0:y1, x0:x1] = True
        elif point_coords is not None:
            for (x, y) in point_coords:
                yy, xx = np.ogrid[:64, :64]
                m |= (yy - y) ** 2 + (xx - x) ** 2 <= 25
        return m[None], None, None


def test_seg_friendly_shapes(rng):
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    out = seg_friendly(img)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert not np.array_equal(out, img)  # it does something


def test_smooth_mask_binary(rng):
    m = (rng.random((64, 64)) > 0.5).astype(np.uint8) * 255
    s = smooth_mask(m, k=5)
    assert set(np.unique(s)) <= {0, 255}


def test_fill_holes():
    m = np.zeros((64, 64), np.uint8)
    m[10:50, 10:50] = 255
    m[20:30, 20:30] = 0
    out = fill_holes(m)
    assert out[25, 25] == 255
    assert out[0, 0] == 0


def test_session_box_and_points_merge():
    img = np.zeros((64, 64, 3), np.uint8)
    s = AnnotationSession(img, None, predictor=FakeSam())
    s.state.apply_smoothing = False
    s.apply_box((5, 5, 20, 20))
    assert s.state.mask[10, 10] == 255
    before = s.state.mask.sum()
    s.apply_points([(40, 40)], [1])
    assert s.state.mask.sum() > before      # OR-merged
    assert s.state.mask[10, 10] == 255      # old region kept
    s.reset()
    assert s.state.mask.sum() == 0


def test_session_brush_fg_bg():
    img = np.zeros((64, 64, 3), np.uint8)
    s = AnnotationSession(img, None)
    s.brush([(30, 30)], label=1, radius=4)
    assert s.state.mask[30, 30] == 255
    s.brush([(30, 30)], label=0, radius=2)
    assert s.state.mask[30, 30] == 0


def test_session_proposal_resized():
    img = np.zeros((64, 64, 3), np.uint8)
    prop = np.zeros((32, 32), np.uint8)
    prop[8:24, 8:24] = 255
    s = AnnotationSession(img, prop)
    assert s.state.mask.shape == (64, 64)
    assert s.state.mask[32, 32] == 255


def test_session_save_sizes(tmp_path):
    img = np.zeros((64, 64, 3), np.uint8)
    s = AnnotationSession(img, None)
    s.state.mask[16:48, 16:48] = 255
    s.save(tmp_path / "fixed.png", size=32)
    assert cv2.imread(str(tmp_path / "fixed.png"), 0).shape == (32, 32)
    # original-resolution save inverts the letterbox
    s.save(tmp_path / "orig.png", orig_hw=(48, 40))
    assert cv2.imread(str(tmp_path / "orig.png"), 0).shape == (48, 40)


def test_prefetch_worker(tmp_path, rng):
    for i in range(3):
        cv2.imwrite(str(tmp_path / f"i{i}.jpeg"),
                    rng.integers(0, 255, (48, 64, 3), np.uint8))
    paths = sorted(tmp_path.glob("*.jpeg"))
    w = PrefetchWorker(paths, proposer=None, img_size=32,
                       make_easy=True).start()
    items = list(w)
    assert len(items) == 3
    assert items[0].image_rgb.shape == (32, 32, 3)
    assert items[0].orig_hw == (48, 64)
    assert items[0].proposal is None


def test_prefetch_swallow_bad_files(tmp_path):
    (tmp_path / "bad.jpeg").write_text("not an image")
    w = PrefetchWorker([tmp_path / "bad.jpeg"], proposer=None,
                       img_size=32).start()
    assert list(w) == []


def test_load_hard_candidates(tmp_path):
    csvp = tmp_path / "hard_candidates.csv"
    csvp.write_text("path,composite\n/a/x.jpeg,0.9\n/a/y.jpeg,0.8\n")
    assert load_hard_candidates(csvp) == [Path("/a/x.jpeg"),
                                          Path("/a/y.jpeg")]
    assert load_hard_candidates(csvp, limit=1) == [Path("/a/x.jpeg")]


def test_pending_paths_and_skip_markers(tmp_path):
    imgs = [tmp_path / f"img_{i}.jpeg" for i in range(3)]
    for p in imgs:
        p.touch()
    out = tmp_path / "out"
    (out / "sub").mkdir(parents=True)
    cv2.imwrite(str(out / "sub" / "img_0.png"), np.zeros((4, 4), np.uint8))
    skips = tmp_path / "skips"
    write_skip_marker(skips, imgs[1])
    left = pending_paths(imgs, [out], skips)
    assert left == [imgs[2]]


def test_load_sam_gated_absent():
    # segment_anything is not installed in this image: must return None,
    # not raise (optional host-side dependency)
    assert load_sam(None) is None
