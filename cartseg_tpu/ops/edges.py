"""Edge maps and boundary statistics on device — the TPU-native stand-in
for the cv2 Canny/findContours QC path (create_pseudo_labels.py:178-189).

Canny's hysteresis is branch-heavy and serial; on TPU we use a Sobel
gradient-magnitude edge map with a single threshold, which serves the
same QC purpose ("does the predicted mask boundary lie on image
edges?"). The default threshold is calibrated so acceptance decisions
track Canny(50,150) on natural images; it is a config knob in the
pseudo-label engine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cartseg_tpu.ops.morphology import erode

_SOBEL_X = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
_SOBEL_Y = _SOBEL_X.T


def rgb_to_gray(rgb):
    """HxWx3 (uint8 or float) -> HxW float32, ITU-R BT.601 weights
    (cv2.cvtColor RGB2GRAY)."""
    rgb = jnp.asarray(rgb, jnp.float32)
    return rgb @ jnp.array([0.299, 0.587, 0.114], jnp.float32)


def _conv3(img, kernel):
    img4 = img[None, :, :, None]
    k4 = kernel[:, :, None, None]
    out = jax.lax.conv_general_dilated(
        img4, k4, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out[0, :, :, 0]


def sobel_edges(gray, threshold: float = 120.0):
    """HxW float gray (0..255 scale) -> bool edge map at |grad| >=
    threshold."""
    gray = jnp.asarray(gray, jnp.float32)
    gx = _conv3(gray, _SOBEL_X)
    gy = _conv3(gray, _SOBEL_Y)
    mag = jnp.sqrt(gx * gx + gy * gy)
    return mag >= threshold


def mask_boundary(mask):
    """1-px inner boundary of a bool mask — the device analog of
    drawContours(thickness=1) over RETR_EXTERNAL contours."""
    mask = jnp.asarray(mask, bool)
    return mask & ~erode(mask, 3, shape="square")


def edge_hit_rate(rgb, mask, threshold: float = 120.0):
    """Fraction of mask-boundary pixels that land on image edges
    (edge_hit_rate, create_pseudo_labels.py:178-189). 0.0 when the
    boundary is empty."""
    edges = sobel_edges(rgb_to_gray(rgb), threshold)
    boundary = mask_boundary(mask)
    tot = jnp.sum(boundary)
    hits = jnp.sum(edges & boundary)
    return jnp.where(tot > 0, hits / jnp.maximum(tot, 1), 0.0)
