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
    """Shift with edge fill as concat(fill-block, slice) — ONE kernel
    per axis. roll + .at[border].set compiles to a roll kernel PLUS a
    full-plane dynamic-update-slice kernel just to write a k-wide
    border; at [64,512,512] that doubled the HBM traffic of every
    shift (the concat lane measured ~2x the roll+fill lane on chip)."""

    def shift1(v, axis, k):
        if k == 0:
            return v
        pad_shape = list(v.shape)
        pad_shape[axis] = min(abs(k), v.shape[axis])
        block = jnp.full(pad_shape, fill, v.dtype)
        keep = v.shape[axis] - pad_shape[axis]
        sl = [slice(None)] * v.ndim
        if k > 0:
            sl[axis] = slice(0, keep)
            return jnp.concatenate([block, v[tuple(sl)]], axis=axis)
        sl[axis] = slice(v.shape[axis] - keep, None)
        return jnp.concatenate([v[tuple(sl)], block], axis=axis)

    return shift1(shift1(x, -2, dy), -1, dx)


def _diag_min(lab, mask, size):
    """Diagonal-neighbor min — the only hop the row/col run scans do
    not subsume (lateral/vertical fg-adjacency IS same-run membership,
    so +-1 row/col shifts would be redundant work)."""
    m = lab
    for dy in (-1, 1):
        for dx in (-1, 1):
            m = jnp.minimum(m, _shift_fill(lab, dy, dx, size))
    return jnp.where(mask, m, size)


def _run_masks_axis(fg, axis: int):
    """Precompute the shift-doubling run-connectivity masks for both
    directions along `axis`: masks[d][j] == "position i - sgn*2^j is in
    the same maximal fg run as i". These depend only on the (constant)
    mask, so hoisting them out of the propagation loop removes the
    r-shift + r&rs chain from every iteration — reading a cached bool
    plane (1 byte/px) instead of recomputing two s32-wide passes."""
    n = fg.shape[axis]
    out = []
    for sgn in (1, -1):
        r = fg & _shift_fill(fg, *((sgn, 0) if axis == -2 else (0, sgn)),
                             fill=False)
        levels = [r]
        k = 1
        while 2 * k < n:
            rs = (_shift_fill(r, sgn * k, 0, False) if axis == -2
                  else _shift_fill(r, 0, sgn * k, False))
            r = r & rs
            levels.append(r)
            k *= 2
        out.append(levels)
    return out


def _run_min_axis(lab, run_masks, size, axis: int):
    """Min label over each maximal contiguous fg run along `axis`,
    via shift doubling with precomputed run masks: v_k[i] = min over
    the in-run window of length <= k ending at i. ceil(log2(n)) steps
    per direction, rolls + elementwise only."""

    def one_direction(v, levels, sgn: int):
        k = 1
        for r in levels:
            if axis == -2:
                vs = _shift_fill(v, sgn * k, 0, size)
            else:
                vs = _shift_fill(v, 0, sgn * k, size)
            v = jnp.where(r, jnp.minimum(v, vs), v)
            k *= 2
        return v

    return jnp.minimum(one_direction(lab, run_masks[0], 1),
                       one_direction(lab, run_masks[1], -1))


def connected_components(mask, max_iter: int = 4096,
                         connectivity: int = 8):
    """[...,H,W] bool -> int32 labels: min-flat-index per connected
    component on fg pixels; `size` (==H*W) on background. connectivity
    8 (the reference's cv2 default everywhere) or 4 (cv2.floodFill's).

    On TPU (when one image's state fits VMEM) dispatches to the
    VMEM-resident Pallas fixpoint (ops/pallas/cc.py — one HBM read +
    one write instead of ~40 shift kernels per sweep); elsewhere, or
    with CARTSEG_PALLAS_CC=0, the XLA sweep loop below (also the
    Pallas lane's parity oracle)."""
    import os

    mask = jnp.asarray(mask, bool)
    H, W = mask.shape[-2:]
    use_pallas = (os.environ.get("CARTSEG_PALLAS_CC", "1") != "0"
                  and jax.default_backend() == "tpu")
    if use_pallas:
        from cartseg_tpu.ops.pallas.cc import cc_batch_pallas, fits_vmem
        if fits_vmem(H, W):
            batched = mask.reshape(-1, H, W)
            lab = cc_batch_pallas(batched, connectivity=connectivity,
                                  max_iter=max_iter)
            return lab.reshape(mask.shape)
    size = H * W
    idx = jnp.arange(size, dtype=jnp.int32).reshape(mask.shape[-2:])
    idx = jnp.broadcast_to(idx, mask.shape)
    labels = jnp.where(mask, idx, size)
    row_masks = _run_masks_axis(mask, -1)
    col_masks = _run_masks_axis(mask, -2)

    def sweep(lab):
        if connectivity == 8:
            lab = _diag_min(lab, mask, size)
        # connectivity 4 needs no neighbor hop at all: lateral/vertical
        # adjacency is exactly same-run membership in the scans below
        lab = _run_min_axis(lab, row_masks, size, -1)
        lab = _run_min_axis(lab, col_masks, size, -2)
        return jnp.where(mask, lab, size)

    def cond(state):
        _, changed, i = state
        return changed & (i < max_iter)

    def body(state):
        lab, _, i = state
        # two sweeps per convergence check: the jnp.any compare-reduce
        # re-reads both label planes, so halving its frequency is a
        # measured win at 512^2 (idempotent once converged)
        nl = sweep(sweep(lab))
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
        vs = _shift_fill(v, 0, k, identity)
        rs = _shift_fill(r, 0, k, False)
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
        # the segmented combine is applied in unstable-sort order, which
        # is only order-insensitive for exactly-associative dtypes; a
        # float sum here would be reassociation-nondeterministic
        if not (jnp.issubdtype(values.dtype, jnp.integer)
                or values.dtype == jnp.bool_):
            raise TypeError(
                f"_label_reduce(kind='sum') needs int/bool values, got "
                f"{values.dtype} (unstable sort order would make a float "
                "sum nondeterministic)")
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
    # unstable: the segmented combine is commutative, so the order of
    # equal-label entries is irrelevant — and XLA's stable-sort
    # lowering materializes an extra internal iota operand (one more
    # full array through every compare-exchange pass)
    s, v, p = jax.lax.sort((lf, vf, pos), dimension=-1, num_keys=1,
                           is_stable=False)
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
    # p is a permutation (all keys distinct) — stability buys nothing
    _, out = jax.lax.sort((p, total), dimension=-1, num_keys=1,
                          is_stable=False)
    return out.reshape(shape)


def per_pixel_component_area(labels):
    """int32 [..HW..] -> area (pixel count) of each pixel's component.
    Background pixels get the background-'component' count — callers
    mask with fg.

    Leaner than _label_reduce(ones): the count of a label run in sorted
    order is (run end - run start + 1) over the implicit position iota,
    so no value operand rides through the big sort and the segmented
    combine collapses to one cummax + one cummin."""
    area, p, _ = _sorted_component_area(labels)
    _, out = jax.lax.sort((p, area), dimension=-1, num_keys=1,
                          is_stable=False)
    return out.reshape(labels.shape)


def _sorted_component_area(labels):
    """Sort labels (unstable — run lengths don't care about the order
    of equal keys, and XLA's stable lowering drags an extra internal
    iota operand through every pass); return (area, positions) in
    sorted order plus the flattened length. area[i] = pixel count of
    the component whose label sits at sorted slot i."""
    shape = labels.shape
    lf = labels.reshape(*shape[:-2], -1)
    n = lf.shape[-1]
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), lf.shape)
    s, p = jax.lax.sort((lf, iota), dimension=-1, num_keys=1,
                        is_stable=False)
    first = jnp.concatenate(
        [jnp.ones((*s.shape[:-1], 1), bool), s[..., 1:] != s[..., :-1]],
        axis=-1)
    last = jnp.concatenate(
        [first[..., 1:], jnp.ones((*s.shape[:-1], 1), bool)], axis=-1)
    start = jax.lax.cummax(jnp.where(first, iota, -1), axis=lf.ndim - 1)
    end = jnp.flip(jax.lax.cummin(
        jnp.flip(jnp.where(last, iota, n), -1), axis=lf.ndim - 1), -1)
    return end - start + 1, p, n


def _rle_enabled() -> bool:
    import os
    return os.environ.get("CARTSEG_RLE_AREA", "1") != "0"


def _pixel_sort_area_at_least(labels, min_area: int):
    """Full-plane two-sort lane — the RLE lane's exact oracle and its
    lax.cond fallback for pathologically fragmented masks."""
    area, p, n = _sorted_component_area(labels)
    keep = (area >= jnp.int32(min_area)).astype(jnp.int32)
    packed = jax.lax.sort(p * 2 + keep, dimension=-1, is_stable=False)
    return (packed & 1).astype(bool).reshape(labels.shape)


def component_area_at_least(labels, min_area: int, rle_k: int = 64):
    """bool [..HW..]: does the pixel's FG component have >= min_area
    pixels? Background pixels are always False (they have no
    component; before round 5 the pixel-sort lane leaked the
    bg-"component" count there and callers masked it off — now both
    lanes agree and the mask is built in).

    Default lane: run-length compaction (ops/cc_stats_rle.py) — sorts
    the <=rle_k-runs-per-row table instead of the pixel plane (the two
    full-plane sorts cost 43.3 ms/batch at bs64@512^2,
    docs/roofline_infer.json round 4). A cheap max-runs-per-row check
    lax.conds to the pixel-sort lane when any row exceeds rle_k, so the
    result is exact for arbitrary masks. CARTSEG_RLE_AREA=0 restores
    the pixel-sort lane outright.

    Pixel-sort lane: same two-sort structure as
    per_pixel_component_area, but the answer is thresholded in SORTED
    space and the un-sort packs the bool into its own key (p*2 + keep —
    positions are a permutation, so sorted slot i holds key p==i and
    the flag is just `& 1`): a single-operand unstable sort instead of
    a key+payload sort."""
    from cartseg_tpu.ops.cc_stats_rle import (
        max_runs_per_row, rle_area_at_least, rle_fits,
        row_runs_precompute)

    H, W = labels.shape[-2:]
    # packed key is p*2 + keep with p < H*W: needs H*W*2 <= 2^31
    assert H * W < 2 ** 30, (
        f"component_area_at_least: {H}x{W} plane overflows the int32 "
        "p*2+keep packing (H*W must be < 2^30)")
    fg = labels < H * W
    if not (_rle_enabled() and rle_k < W and rle_fits(H, W, rle_k)):
        return _pixel_sort_area_at_least(labels, min_area) & fg
    # the fg/is_start/prefix planes feed BOTH the max-runs guard and
    # the RLE branch — computing them outside the cond saves the
    # branch re-paying the pad/shift/cumsum full-plane passes
    pre = row_runs_precompute(labels, H * W)
    nmax = max_runs_per_row(labels, H * W, is_start=pre[1])
    return jax.lax.cond(
        nmax <= rle_k,
        lambda l, p: rle_area_at_least(l, min_area, rle_k, pre=p),
        lambda l, p: _pixel_sort_area_at_least(l, min_area) & p[0],
        labels, pre)


def per_pixel_component_any(labels, flags):
    """bool [..HW..] -> does any pixel sharing my label have flag set?"""
    return _label_reduce(labels, jnp.asarray(flags, bool), "any")


def remove_small_components(mask, min_area: int, max_iter: int = 4096):
    """Drop fg components below min_area pixels — `clean_mask`
    (create_pseudo_labels.py:124-138)."""
    mask = jnp.asarray(mask, bool)
    labels = connected_components(mask, max_iter)
    return mask & component_area_at_least(labels, min_area)


def count_components(mask, max_iter: int = 4096):
    """Number of 8-connected fg components (mine_hard_cases.py:93-95)."""
    mask = jnp.asarray(mask, bool)
    H, W = mask.shape[-2:]
    labels = connected_components(mask, max_iter)
    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    roots = mask & (labels == idx)
    return jnp.sum(roots)


def _pixel_sort_largest(mask, labels, size):
    """Full-plane lane of keep_largest_component (oracle/fallback).
    NOTE: reduces over ALL leading axes (historical behavior — callers
    batch via vmap); the RLE lane matches it by reducing per image and
    then taking the global argmax only when unbatched, so both lanes
    agree on the [H,W] inputs the cleaners pass."""
    area = jnp.where(mask, per_pixel_component_area(labels), 0)
    best_area = jnp.max(area)
    tied = mask & (area == best_area)
    best_label = jnp.min(jnp.where(tied, labels, size))
    return mask & (labels == best_label) & (best_area > 0)


def keep_largest_component(mask, max_iter: int = 4096, rle_k: int = 64):
    """Keep only the largest fg component
    (remove_blops.py:14-33, clean_complete.py:85-91). Empty in, empty
    out. On area ties cv2 keeps the first (smallest) label; the min
    over tied labels reproduces that.

    Default lane: run-space reductions (ops/cc_stats_rle.py) — the best
    (area, label) pair falls out of the compacted run table with no
    un-sort or pixel route-back at all; lax.cond falls back to the
    full-plane lane when any row has more than rle_k runs."""
    from cartseg_tpu.ops.cc_stats_rle import (
        max_runs_per_row, rle_fits, rle_largest_label,
        row_runs_precompute)

    mask = jnp.asarray(mask, bool)
    H, W = mask.shape[-2:]
    size = H * W
    labels = connected_components(mask, max_iter)
    if not (_rle_enabled() and rle_k < W and rle_fits(H, W, rle_k)
            and mask.ndim == 2):
        return _pixel_sort_largest(mask, labels, size)

    # shared with the max-runs guard — hoisted out of the cond exactly
    # as in component_area_at_least (full-plane pad/shift/cumsum passes)
    pre = row_runs_precompute(labels, size)

    def fast(l):
        best_label, best_area = rle_largest_label(l, rle_k, pre=pre)
        return mask & (l == best_label) & (best_area > 0)

    nmax = max_runs_per_row(labels, size, is_start=pre[1])
    return jax.lax.cond(nmax <= rle_k, fast,
                        lambda l: _pixel_sort_largest(mask, l, size),
                        labels)
