"""Connected components on device via iterative min-label propagation —
the jnp replacement for cv2.connectedComponentsWithStats used all over
the reference QC/cleaning path (create_pseudo_labels.py:124-138,
remove_blops.py:14-33, mine_hard_cases.py:93-95).

Propagation uses 8-connectivity (the reference always passes
connectivity=8) and doubles its reach each round by re-propagating the
already-minimized labels, converging in O(diameter) rounds with
early-exit. Labels are flat pixel indices; each component's label is
the min index it contains.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = jnp.int32(2 ** 30)


def _shift_fill_i(x, dy: int, dx: int, fill):
    out = jnp.roll(x, (dy, dx), axis=(0, 1))
    if dy > 0:
        out = out.at[:dy, :].set(fill)
    elif dy < 0:
        out = out.at[dy:, :].set(fill)
    if dx > 0:
        out = out.at[:, :dx].set(fill)
    elif dx < 0:
        out = out.at[:, dx:].set(fill)
    return out


def connected_components(mask, max_iter: int = 4096):
    """HxW bool -> int32 labels: min-flat-index per 8-connected
    component on fg pixels; `size` (==H*W) on background."""
    mask = jnp.asarray(mask, bool)
    H, W = mask.shape
    size = H * W
    idx = jnp.arange(size, dtype=jnp.int32).reshape(H, W)
    labels = jnp.where(mask, idx, size)

    def step(lab):
        m = lab
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                m = jnp.minimum(m, _shift_fill_i(lab, dy, dx, size))
        return jnp.where(mask, m, size)

    def cond(state):
        lab, changed, i = state
        return changed & (i < max_iter)

    def body(state):
        lab, _, i = state
        # pointer-jump: after the neighborhood min, look up each pixel's
        # label at the pixel that label points to — doubles effective
        # propagation reach per round (O(diameter) -> O(log diameter)
        # once fronts meet)
        nl = step(lab)
        flat = nl.reshape(-1)
        safe = jnp.clip(flat, 0, size - 1)
        jumped = jnp.where(nl < size, flat[safe].reshape(H, W), nl)
        nl = jnp.where(mask, jnp.minimum(nl, jumped), size)
        return nl, jnp.any(nl != lab), i + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (labels, jnp.bool_(True), 0))
    return labels


def component_areas(labels, size: int):
    """Histogram of label -> pixel count ([size+1] int32)."""
    flat = labels.reshape(-1)
    fg = (flat < size).astype(jnp.int32)
    return jnp.zeros((size + 1,), jnp.int32).at[flat].add(fg)


def count_components(mask, max_iter: int = 4096):
    """Number of 8-connected fg components (mine_hard_cases.py:93-95)."""
    mask = jnp.asarray(mask, bool)
    H, W = mask.shape
    labels = connected_components(mask, max_iter)
    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    roots = mask & (labels == idx)
    return jnp.sum(roots)


def keep_largest_component(mask, max_iter: int = 4096):
    """Keep only the largest fg component
    (remove_blops.py:14-33, clean_complete.py:85-91). Empty in, empty
    out. On area ties cv2 keeps the first (smallest) label; the min
    over tied argmax labels reproduces that."""
    mask = jnp.asarray(mask, bool)
    H, W = mask.shape
    size = H * W
    labels = connected_components(mask, max_iter)
    areas = component_areas(labels, size).at[size].set(0)
    best_area = jnp.max(areas)
    # smallest label among those with max area (cv2 tie order = label order)
    cand = jnp.where(areas == best_area,
                     jnp.arange(size + 1), size + 1)
    best = jnp.min(cand)
    return mask & (labels == best) & (best_area > 0)


def remove_small_components(mask, min_area: int, max_iter: int = 4096):
    """Drop fg components below min_area pixels — `clean_mask`
    (create_pseudo_labels.py:124-138)."""
    mask = jnp.asarray(mask, bool)
    H, W = mask.shape
    size = H * W
    labels = connected_components(mask, max_iter)
    areas = component_areas(labels, size)
    return mask & (areas[labels] >= min_area)
