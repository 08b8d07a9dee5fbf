"""Binary morphology on device — the jnp equivalents of the cv2 calls
in the reference mask cleaners (clean_complete.py:69-103,
clean_masks.py:12-32): erosion/dilation with elliptical structuring
elements via shifted max/min (VPU-only, XLA-fused), flood-fill hole
filling via iterative propagation under `lax.while_loop`.

Masks are HxW bool (vmap for batches).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def ellipse_kernel(ksize: int) -> tuple:
    """cv2.getStructuringElement(MORPH_ELLIPSE, (k,k)) offsets as a
    tuple of (dy, dx). Uses cv2 when available (compile-time constant),
    else the same inscribed-ellipse formula."""
    try:
        import cv2
        k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksize, ksize))
    except Exception:
        r = ksize // 2
        yy, xx = np.mgrid[-r:r + 1, -r:r + 1]
        k = ((xx / max(r, 1)) ** 2 + (yy / max(r, 1)) ** 2 <= 1.0 + 1e-9)
        k = k.astype(np.uint8)
    r = ksize // 2
    offs = [(int(dy) - r, int(dx) - r) for dy, dx in np.argwhere(k > 0)]
    return tuple(offs)


def square_kernel(ksize: int) -> tuple:
    r = ksize // 2
    return tuple((dy, dx) for dy in range(-r, ksize - r)
                 for dx in range(-r, ksize - r))


def _shift_fill(x, dy: int, dx: int, fill):
    # concat(fill-block, slice) is one kernel per axis; roll + border
    # .at[].set adds a full-plane dynamic-update-slice per shift
    # (see connected_components._shift_fill)
    from cartseg_tpu.ops.connected_components import (
        _shift_fill as _sf)
    return _sf(x, dy, dx, fill)


def dilate(mask, ksize: int = 3, shape: str = "ellipse"):
    """Binary dilation; border behaves like cv2 (constant 0 outside)."""
    mask = jnp.asarray(mask, bool)
    offs = ellipse_kernel(ksize) if shape == "ellipse" else square_kernel(ksize)
    out = jnp.zeros_like(mask)
    for dy, dx in offs:
        out = out | _shift_fill(mask, dy, dx, False)
    return out


def erode(mask, ksize: int = 3, shape: str = "ellipse"):
    """Binary erosion; border pixels outside count as fg (cv2's +inf
    constant border for erode)."""
    mask = jnp.asarray(mask, bool)
    offs = ellipse_kernel(ksize) if shape == "ellipse" else square_kernel(ksize)
    out = jnp.ones_like(mask)
    for dy, dx in offs:
        out = out & _shift_fill(mask, dy, dx, True)
    return out


def morph_open(mask, ksize: int = 3, shape: str = "ellipse"):
    return dilate(erode(mask, ksize, shape), ksize, shape)


def morph_close(mask, ksize: int = 7, shape: str = "ellipse"):
    return erode(dilate(mask, ksize, shape), ksize, shape)


def fill_holes_from_border(mask, max_iter: int = 4096):
    """Fill ALL holes: background not flood-reachable from the border
    becomes fg — the `clean_mask` flood-fill (clean_masks.py:12-32).

    Flood-reachability from the border == "my bg component contains a
    border pixel", computed scatter-free via the CC machinery
    (connected_components.py design notes). 4-connectivity, matching
    cv2.floodFill's default spread."""
    from cartseg_tpu.ops.connected_components import (
        connected_components, per_pixel_component_any)

    mask = jnp.asarray(mask, bool)
    bg = ~mask
    border = jnp.zeros_like(bg).at[0, :].set(True).at[-1, :].set(True) \
        .at[:, 0].set(True).at[:, -1].set(True)
    labels = connected_components(bg, max_iter=max_iter, connectivity=4)
    outside = per_pixel_component_any(labels, border & bg)
    return mask | (bg & ~outside)


def fill_small_holes(mask, max_hole_area_frac: float = 0.004,
                     max_iter: int = 4096):
    """Fill only holes with area <= frac * H * W, leaving big holes and
    border-touching background — `fill_small_holes`
    (clean_complete.py:69-83)."""
    from cartseg_tpu.ops.connected_components import (
        connected_components, per_pixel_component_any,
        per_pixel_component_area)

    mask = jnp.asarray(mask, bool)
    H, W = mask.shape
    max_area = jnp.floor(H * W * max_hole_area_frac)  # int() truncation
    bg = ~mask
    labels = connected_components(bg, max_iter=max_iter)
    areas = per_pixel_component_area(labels)
    border = jnp.zeros_like(bg).at[0, :].set(True).at[-1, :].set(True) \
        .at[:, 0].set(True).at[:, -1].set(True)
    touches = per_pixel_component_any(labels, border & bg)
    fill = bg & (areas <= max_area) & ~touches
    return mask | fill
