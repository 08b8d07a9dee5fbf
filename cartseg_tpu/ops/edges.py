"""Edge maps and boundary statistics on device — the TPU-native stand-in
for the cv2 Canny/findContours QC path (create_pseudo_labels.py:178-189).

Two edge detectors:
  * canny_edges — faithful device Canny: Sobel-3 with replicate border,
    L1 gradient magnitude, sector-quantized non-maximum suppression and
    double-threshold hysteresis via an iterative masked dilation
    (lax.while_loop). Mirrors cv2.Canny(gray, low, high) semantics
    (default L2gradient=False) and is the default QC gate.
  * sobel_edges — single-threshold gradient magnitude, a cheaper knob.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cartseg_tpu.ops.morphology import dilate, erode

_SOBEL_X = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
_SOBEL_Y = _SOBEL_X.T


def rgb_to_gray(rgb):
    """HxWx3 (uint8 or float) -> HxW float32, ITU-R BT.601 weights
    (cv2.cvtColor RGB2GRAY)."""
    rgb = jnp.asarray(rgb, jnp.float32)
    return rgb @ jnp.array([0.299, 0.587, 0.114], jnp.float32)


def _conv3(img, kernel):
    shape = img.shape
    img4 = img.reshape(-1, *shape[-2:])[..., None]
    k4 = kernel[:, :, None, None]
    out = jax.lax.conv_general_dilated(
        img4, k4, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out[..., 0].reshape(shape)


def sobel_edges(gray, threshold: float = 120.0):
    """HxW float gray (0..255 scale) -> bool edge map at |grad| >=
    threshold."""
    gray = jnp.asarray(gray, jnp.float32)
    gx = _conv3(gray, _SOBEL_X)
    gy = _conv3(gray, _SOBEL_Y)
    mag = jnp.sqrt(gx * gx + gy * gy)
    return mag >= threshold


def _shift(a, dy: int, dx: int):
    """Shift over the last two axes, zero-filling vacated cells."""
    from cartseg_tpu.ops.connected_components import _shift_fill
    return _shift_fill(a, dy, dx, 0)


def _sobel_replicate(gray):
    """Sobel-3 dx, dy with replicate border (cv2 BORDER_REPLICATE, the
    border cv2.Canny uses). Batched over leading dims. Returns
    (gx, gy) float32."""
    gray = jnp.asarray(gray, jnp.float32)
    pad = [(0, 0)] * (gray.ndim - 2) + [(1, 1), (1, 1)]
    g = jnp.pad(gray, pad, mode="edge")
    g4 = g.reshape(-1, *g.shape[-2:])[..., None]
    kx = _SOBEL_X[:, :, None, None]
    ky = _SOBEL_Y[:, :, None, None]
    gx = jax.lax.conv_general_dilated(
        g4, kx, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]
    gy = jax.lax.conv_general_dilated(
        g4, ky, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]
    return gx.reshape(gray.shape), gy.reshape(gray.shape)


def canny_edges(gray, low: float = 50.0, high: float = 150.0,
                max_hysteresis_iters: int = 256):
    """Device Canny matching cv2.Canny(gray, low, high) semantics:
    Sobel-3 (replicate border), L1 magnitude |gx|+|gy| (cv2 default
    L2gradient=False), 4-sector non-maximum suppression, and hysteresis
    (edges = pixels above `high`, plus above-`low` pixels 8-connected
    to one through other above-`low` pixels). Batched over leading
    dims. Hysteresis is a reachability fixpoint: on TPU it runs as the
    VMEM-resident Pallas min-propagation (ops/pallas/cc.py
    reach_batch_pallas — one HBM round trip for the whole fixpoint);
    elsewhere (or CARTSEG_PALLAS_CC=0) as a masked-dilation
    lax.while_loop over HBM. Reference QC gate:
    create_pseudo_labels.py:178-189 uses Canny(50,150)."""
    gx, gy = _sobel_replicate(gray)
    mag = jnp.abs(gx) + jnp.abs(gy)

    ax, ay = jnp.abs(gx), jnp.abs(gy)
    tg22 = 0.4142135623730951  # tan(22.5 deg)
    horiz = ay <= tg22 * ax                       # gradient ~horizontal
    vert = ax <= tg22 * ay                        # gradient ~vertical
    diag = ~(horiz | vert)
    same_sign = (gx * gy) >= 0.0                  # 45deg vs 135deg

    n_l, n_r = _shift(mag, 0, 1), _shift(mag, 0, -1)
    n_u, n_d = _shift(mag, 1, 0), _shift(mag, -1, 0)
    n_ul, n_dr = _shift(mag, 1, 1), _shift(mag, -1, -1)
    n_ur, n_dl = _shift(mag, 1, -1), _shift(mag, -1, 1)

    keep_h = (mag > n_l) & (mag >= n_r)
    keep_v = (mag > n_u) & (mag >= n_d)
    keep_d1 = (mag > n_ul) & (mag >= n_dr)   # 135deg (same sign grads)
    keep_d2 = (mag > n_ur) & (mag >= n_dl)   # 45deg
    keep = jnp.where(horiz, keep_h,
                     jnp.where(vert, keep_v,
                               jnp.where(same_sign & diag, keep_d1,
                                         keep_d2)))

    strong = keep & (mag > high)
    weak = keep & (mag > low)
    return _hysteresis(weak, strong, max_hysteresis_iters)


def _hysteresis(weak, strong, max_iters: int = 256):
    """weak/strong [...,H,W] bool -> weak pixels 8-connected to a
    strong pixel through weak pixels."""
    import os

    H, W = weak.shape[-2:]
    use_pallas = (os.environ.get("CARTSEG_PALLAS_CC", "1") != "0"
                  and jax.default_backend() == "tpu")
    if use_pallas:
        from cartseg_tpu.ops.pallas.cc import reach_batch_pallas, fits_vmem
        if fits_vmem(H, W):
            out = reach_batch_pallas(weak.reshape(-1, H, W),
                                     strong.reshape(-1, H, W))
            return out.reshape(weak.shape)

    def body(state):
        cur, _, i = state
        grown = weak & dilate(cur, 3, shape="square")
        delta = jnp.sum(grown.astype(jnp.int32)) - jnp.sum(
            cur.astype(jnp.int32))
        return grown, delta, i + 1

    def cond(state):
        _, delta, i = state
        return (delta > 0) & (i < max_iters)

    init = (strong, jnp.array(1, jnp.int32), jnp.array(0, jnp.int32))
    final, _, _ = jax.lax.while_loop(cond, body, init)
    return final


def mask_boundary(mask):
    """1-px inner boundary of a bool mask — the device analog of
    drawContours(thickness=1) over RETR_EXTERNAL contours."""
    mask = jnp.asarray(mask, bool)
    return mask & ~erode(mask, 3, shape="square")


def edge_hit_rate(rgb, mask, threshold: float = 120.0,
                  method: str = "canny",
                  low: float = 50.0, high: float = 150.0):
    """Fraction of mask-boundary pixels that land on image edges
    (edge_hit_rate, create_pseudo_labels.py:178-189). 0.0 when the
    boundary is empty. method='canny' (reference-faithful default,
    Canny(50,150)) or 'sobel' (single `threshold` on |grad|)."""
    gray = rgb_to_gray(rgb)
    if method == "canny":
        edges = canny_edges(gray, low, high)
    else:
        edges = sobel_edges(gray, threshold)
    boundary = mask_boundary(mask)
    tot = jnp.sum(boundary)
    hits = jnp.sum(edges & boundary)
    return jnp.where(tot > 0, hits / jnp.maximum(tot, 1), 0.0)
