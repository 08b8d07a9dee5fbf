"""Connected components on device — the jnp replacement for
cv2.connectedComponentsWithStats used all over the reference
QC/cleaning path (create_pseudo_labels.py:124-138, remove_blops.py:14-33,
mine_hard_cases.py:93-95).

Labels are flat pixel indices; each component's label is the min index
it contains (== cv2's raster order of first pixel, which makes
tie-breaking match cv2 exactly). 8-connectivity throughout (the
reference always passes connectivity=8).

TPU design notes. The chip has no fast random gather/scatter: an HLO
scatter-add into a 262k-bin histogram and the pointer-jump gather of a
classic label-propagation loop both serialize on the scalar core
(measured 28 s EACH for one bs64@512^2 batch — docs/roofline_infer.json,
round 4). Everything here is therefore built from primitives XLA maps
to the vector unit:

  * label propagation = 8-neighbor min (rolls) accelerated by
    shift-doubling SEGMENTED scans along rows and columns (min over
    each contiguous fg run in O(log W) rolls) — a straight run is
    crossed in one pass, so the outer while_loop converges in
    O(geodesic turns) iterations instead of O(diameter);
  * per-component statistics (areas, border contact) = sort by label,
    shift-doubling segmented reduce over the sorted runs, sort back by
    position. Two lax.sorts replace the histogram scatter and the
    areas[labels] gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _shift_fill(x, dy: int, dx: int, fill):
    out = jnp.roll(x, (dy, dx), axis=(-2, -1))
    if dy > 0:
        out = out.at[..., :dy, :].set(fill)
    elif dy < 0:
        out = out.at[..., dy:, :].set(fill)
    if dx > 0:
        out = out.at[..., :, :dx].set(fill)
    elif dx < 0:
        out = out.at[..., :, dx:].set(fill)
    return out


def _neighbor_min(lab, mask, size, connectivity: int):
    """One connectivity hop: min label over self + neighbors.
    Background holds `size`, so bg neighbors never contaminate."""
    m = lab
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            if connectivity == 4 and dy != 0 and dx != 0:
                continue
            m = jnp.minimum(m, _shift_fill(lab, dy, dx, size))
    return jnp.where(mask, m, size)


def _run_min_axis(lab, fg, size, axis: int):
    """Min label over each maximal contiguous fg run along `axis`,
    via shift doubling: v_k[i] = min over the in-run window of length
    <= k ending at i; r_k[i] = "position i-k is in the same run as i".
    ceil(log2(n)) steps per direction, rolls + elementwise only."""
    n = lab.shape[axis]

    def one_direction(v, sgn: int):
        r = fg & _shift_fill(fg, *((sgn, 0) if axis == -2 else (0, sgn)),
                             fill=False)
        k = 1
        while k < n:
            if axis == -2:
                vs = _shift_fill(v, sgn * k, 0, size)
                rs = _shift_fill(r, sgn * k, 0, False)
            else:
                vs = _shift_fill(v, 0, sgn * k, size)
                rs = _shift_fill(r, 0, sgn * k, False)
            v = jnp.where(r, jnp.minimum(v, vs), v)
            r = r & rs
            k *= 2
        return v

    return jnp.minimum(one_direction(lab, 1), one_direction(lab, -1))


def connected_components(mask, max_iter: int = 4096,
                         connectivity: int = 8):
    """HxW bool -> int32 labels: min-flat-index per connected component
    on fg pixels; `size` (==H*W) on background. connectivity 8 (the
    reference's cv2 default everywhere) or 4 (cv2.floodFill's)."""
    mask = jnp.asarray(mask, bool)
    H, W = mask.shape[-2:]
    size = H * W
    idx = jnp.arange(size, dtype=jnp.int32).reshape(mask.shape[-2:])
    idx = jnp.broadcast_to(idx, mask.shape)
    labels = jnp.where(mask, idx, size)

    def cond(state):
        _, changed, i = state
        return changed & (i < max_iter)

    def body(state):
        lab, _, i = state
        nl = _neighbor_min(lab, mask, size, connectivity)
        nl = _run_min_axis(nl, mask, size, -1)   # along rows
        nl = _run_min_axis(nl, mask, size, -2)   # along columns
        nl = jnp.where(mask, nl, size)
        return nl, jnp.any(nl != lab), i + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.bool_(True), 0))
    return labels


def _segmented_prefix(v, same, combine, identity):
    """Shift-doubling prefix combine along the last axis of a sorted
    array: same[i] == "position i-1 belongs to position i's segment".
    Returns per-position combine over seg_start..i."""
    n = v.shape[-1]
    r = same
    k = 1
    while k < n:
        vs = jnp.roll(v, k, axis=-1)
        vs = vs.at[..., :k].set(identity)
        rs = jnp.roll(r, k, axis=-1)
        rs = rs.at[..., :k].set(False)
        v = jnp.where(r, combine(v, vs), v)
        r = r & rs
        k *= 2
    return v


def _label_reduce(labels, values, kind: str):
    """Per-pixel reduce ('sum' or 'any') of `values` over all pixels
    sharing the pixel's label. Sort by label -> segmented prefix+suffix
    combine over the (now contiguous) label runs -> sort back by
    position. No scatters, no gathers."""
    if kind == "sum":
        combine, identity = jnp.add, jnp.int32(0)
    elif kind == "any":
        combine, identity = jnp.logical_or, False
    else:
        raise ValueError(kind)
    shape = labels.shape
    lf = labels.reshape(*shape[:-2], -1)
    vf = values.reshape(*shape[:-2], -1)
    n = lf.shape[-1]
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), lf.shape)
    s, v, p = jax.lax.sort((lf, vf, pos), dimension=-1, num_keys=1)
    same = jnp.concatenate(
        [jnp.zeros((*s.shape[:-1], 1), bool), s[..., 1:] == s[..., :-1]],
        axis=-1)
    pre = _segmented_prefix(v, same, combine, identity)
    # suffix: previous-in-flipped-order == next-in-original-order
    same_next = jnp.roll(same, -1, -1).at[..., -1:].set(False)
    suf = jnp.flip(_segmented_prefix(
        jnp.flip(v, -1), jnp.flip(same_next, -1), combine, identity), -1)
    # pre and suf both include v itself
    total = pre + suf - v if kind == "sum" else pre | suf
    _, out = jax.lax.sort((p, total), dimension=-1, num_keys=1)
    return out.reshape(shape)


def per_pixel_component_area(labels):
    """int32 [..HW..] -> area (pixel count) of each pixel's component.
    Background pixels get the background-'component' count — callers
    mask with fg."""
    ones = jnp.ones(labels.shape, jnp.int32)
    return _label_reduce(labels, ones, "sum")


def per_pixel_component_any(labels, flags):
    """bool [..HW..] -> does any pixel sharing my label have flag set?"""
    return _label_reduce(labels, jnp.asarray(flags, bool), "any")


def remove_small_components(mask, min_area: int, max_iter: int = 4096):
    """Drop fg components below min_area pixels — `clean_mask`
    (create_pseudo_labels.py:124-138)."""
    mask = jnp.asarray(mask, bool)
    labels = connected_components(mask, max_iter)
    area = per_pixel_component_area(labels)
    return mask & (area >= min_area)


def count_components(mask, max_iter: int = 4096):
    """Number of 8-connected fg components (mine_hard_cases.py:93-95)."""
    mask = jnp.asarray(mask, bool)
    H, W = mask.shape[-2:]
    labels = connected_components(mask, max_iter)
    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    roots = mask & (labels == idx)
    return jnp.sum(roots)


def keep_largest_component(mask, max_iter: int = 4096):
    """Keep only the largest fg component
    (remove_blops.py:14-33, clean_complete.py:85-91). Empty in, empty
    out. On area ties cv2 keeps the first (smallest) label; the min
    over tied labels reproduces that."""
    mask = jnp.asarray(mask, bool)
    H, W = mask.shape[-2:]
    size = H * W
    labels = connected_components(mask, max_iter)
    area = jnp.where(mask, per_pixel_component_area(labels), 0)
    best_area = jnp.max(area)
    tied = mask & (area == best_area)
    best_label = jnp.min(jnp.where(tied, labels, size))
    return mask & (labels == best_label) & (best_area > 0)
