"""Run-length (RLE) component statistics — the small-sort lane for
per-component areas.

The scatter-free stats in ops/connected_components.py sort the FULL
label plane twice (two unstable lax.sorts over H*W elements per image).
XLA's TPU sort is a bitonic network whose pass count grows with the
sort length — at bs64@512^2 the two sorts cost 43.3 ms/batch at ~2% of
HBM peak (docs/roofline_infer.json, round 4), the top non-model cost of
the fused pseudo-label program.

This lane shrinks the sorted domain from PIXELS to ROW-RUNS. A
connected component intersects each image row in maximal horizontal
runs, every pixel of a run shares the component label (lateral
adjacency), and a 512-wide row holds at most 256 runs — real
threshold-mask content holds a handful. Pipeline (per batch, all
batch-vectorized, no scatters or gathers anywhere):

  1. run starts from one shift; per-run fg-prefix from one row cumsum
     (run length = neighbor difference of the prefix IN RUN SPACE — no
     second scan);
  2. compact each row's runs into K slots with ONE row-wise sort
     (length-W rows, vectorized across B*H sublanes — far cheaper per
     element than a length-H*W sort);
  3. ONE global sort of the [H*K] run table by label + segmented
     prefix/suffix sum of run lengths = exact component area per run;
  4. route per-run results back to pixels with a packed un-sort over
     the K-compacted table, a positional merge-sort against the row
     (slot c of the merge holds col c's value), and one cummax
     broadcast along rows.

Exactness: identical to the pixel-sort lane whenever every row has
<= K runs; callers check the (cheap) run count and lax.cond to the
pixel-sort oracle otherwise, so the public ops stay exact for
arbitrary masks (checkerboards included).

Replaces the stats half of cv2.connectedComponentsWithStats
(reference create_pseudo_labels.py:124-138, remove_blops.py:14-33).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _bits_for(n: int) -> int:
    """Bits needed to hold values 0..n inclusive."""
    return int(n).bit_length()


def rle_fits(H: int, W: int, K: int) -> bool:
    """Static guard: every packed key/payload below stays in int32."""
    bits_x = _bits_for(W + 1)          # fg prefix (0..W) + virtual W+1
    bits_rl = _bits_for(W)             # run length 0..W
    bits_q = _bits_for(H * K - 1)      # run-table position
    bits_area = _bits_for(H * W)       # component area
    return (
        H * W * (1 << bits_x) < 2 ** 31        # label*X + x packing
        and bits_rl + bits_q < 31              # rowlen*Q + q packing
        and H * K * 2 < 2 ** 31                # q*2 + keep packing
        and W * (1 << (bits_area + 1)) < 2 ** 31  # col*A + area broadcast
    )


def row_runs_precompute(labels, size: int):
    """The three full-plane intermediates every RLE op needs:
    (fg, is_start, x). Callers that wrap the RLE lane in a lax.cond
    compute these ONCE outside the conditional (they are also what the
    max-runs guard needs), instead of paying the pad/shift/cumsum
    passes again inside the branch."""
    fg = labels < size
    # run start = fg pixel with bg (or edge) on its left — one shift
    left_fg = jnp.pad(fg[..., :-1], [(0, 0)] * (fg.ndim - 1) + [(1, 0)])
    is_start = fg & ~left_fg
    # inclusive fg prefix per row; run j's length = x_{j+1} - x_j where
    # x_j = prefix at start j and x_m = total + 1 (virtual next start)
    x = lax.cumsum(fg.astype(jnp.int32), axis=fg.ndim - 1)
    return fg, is_start, x


def _run_table(labels, size: int, K: int, pre=None):
    """Compacted row-run table.

    labels: [..., H, W] s32 (min-flat-index labels, `size` on bg).
    Returns (label_c, start_c, rowlen_c, valid_c) each [..., H, K],
    plus is_start [..., H, W] (needed again for the pixel route-back).
    Invalid slots: label_c == size, rowlen_c == 0.
    pre: optional precomputed row_runs_precompute(labels, size).
    """
    H, W = labels.shape[-2:]
    fg, is_start, x = pre if pre is not None else row_runs_precompute(
        labels, size)
    col = jnp.arange(W, dtype=jnp.int32)
    col = jnp.broadcast_to(col, fg.shape)

    # compaction row-sort: key = startcol (distinct, left-to-right run
    # order) else W; payload packs (label, x) into one s32 so the sort
    # carries a single payload plane
    bits_x = _bits_for(W + 1)
    key = jnp.where(is_start, col, W)
    payload = labels * (1 << bits_x) + x
    skey, spay = lax.sort((key, payload), dimension=-1, num_keys=1,
                          is_stable=False)
    skey = skey[..., :K]
    spay = spay[..., :K]
    valid = skey < W
    label_c = jnp.where(valid, spay >> bits_x, size)
    x_c = spay & ((1 << bits_x) - 1)
    start_c = jnp.where(valid, skey, W)

    total = x[..., -1:] + 1
    x_next = jnp.concatenate([x_c[..., 1:], jnp.zeros_like(x_c[..., :1])],
                             axis=-1)
    valid_next = jnp.concatenate(
        [valid[..., 1:], jnp.zeros_like(valid[..., :1])], axis=-1)
    x_next = jnp.where(valid_next, x_next, total)
    rowlen_c = jnp.where(valid, x_next - x_c, 0)
    return label_c, start_c, rowlen_c, valid, is_start


def _segmented_prefix_sum(v, same):
    """Shift-doubling inclusive prefix sum along the last axis within
    segments (same[i] == position i-1 is in my segment).

    NOTE: connected_components._segmented_prefix is the general
    (combine, identity) form of this over the _shift_fill idiom; this
    copy stays specialized to (+, 0) with jnp.pad shifts because the
    run table it scans is K-compacted (tiny — [..,H*K]), where the
    concat-vs-pad lowering difference that motivated _shift_fill on
    full planes is immaterial. Fix bugs in BOTH if the scan logic ever
    changes."""
    n = v.shape[-1]
    r = same
    k = 1
    while k < n:
        pad = [(0, 0)] * (v.ndim - 1)
        vs = jnp.pad(v[..., :-k], pad + [(k, 0)])
        rs = jnp.pad(r[..., :-k], pad + [(k, 0)])
        v = jnp.where(r, v + vs, v)
        r = r & rs
        k *= 2
    return v


def _run_areas_sorted(label_c, rowlen_c, H: int, W: int, K: int):
    """Global sort of the run table by label + segmented sum of run
    lengths -> (sorted labels s, per-run component area, position q),
    all [..., H*K]."""
    lead = label_c.shape[:-2]
    lf = label_c.reshape(*lead, H * K)
    rf = rowlen_c.reshape(*lead, H * K)
    n = H * K
    bits_q = _bits_for(n - 1)
    q = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), lf.shape)
    pay = rf * (1 << bits_q) + q
    s, sp = lax.sort((lf, pay), dimension=-1, num_keys=1, is_stable=False)
    rl = sp >> bits_q
    q_s = sp & ((1 << bits_q) - 1)
    same = jnp.concatenate(
        [jnp.zeros((*s.shape[:-1], 1), bool), s[..., 1:] == s[..., :-1]],
        axis=-1)
    pre = _segmented_prefix_sum(rl, same)
    same_next = jnp.concatenate(
        [same[..., 1:], jnp.zeros((*s.shape[:-1], 1), bool)], axis=-1)
    suf = jnp.flip(_segmented_prefix_sum(
        jnp.flip(rl, -1), jnp.flip(same_next, -1)), -1)
    area = pre + suf - rl
    return s, area, q_s


def _scatter_to_starts(values_c, start_c, is_start, fill_value=0):
    """Positional scatter: value of run slot j -> its start column.

    Merge-sort trick: concat per-row (fillers keyed by their column,
    dummies at start columns/invalid slots keyed W) with the K run
    entries keyed by start column. Keys 0..W-1 appear exactly once
    each, so after one sort slot c holds col c's value. No scatter HLO.
    """
    H, W = is_start.shape[-2:]
    col = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32), is_start.shape)
    fkey = jnp.where(is_start, W, col)
    fval = jnp.full(is_start.shape, fill_value, values_c.dtype)
    mk = jnp.concatenate([fkey, start_c], axis=-1)
    mv = jnp.concatenate([fval, values_c], axis=-1)
    mk, mv = lax.sort((mk, mv), dimension=-1, num_keys=1, is_stable=False)
    return mv[..., :W]


def _broadcast_along_runs(start_vals, is_start, fg, bits_v: int):
    """Fill every fg pixel with its run start's value via one cummax of
    col*2^bits_v + value (monotone in col across starts)."""
    W = fg.shape[-1]
    col = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32), fg.shape)
    packed = jnp.where(is_start, col * (1 << bits_v) + start_vals,
                       jnp.int32(-1))
    s = lax.cummax(packed, axis=packed.ndim - 1)
    return jnp.where(fg & (s >= 0), s & ((1 << bits_v) - 1), 0)


def max_runs_per_row(labels, size: int, is_start=None):
    """Cheap pre-check for the lax.cond fallback: the max number of
    row-runs in any row of any image of the batch."""
    if is_start is None:
        _, is_start, _ = row_runs_precompute(labels, size)
    return jnp.max(jnp.sum(is_start.astype(jnp.int32), axis=-1))


def rle_area_at_least(labels, min_area: int, K: int, pre=None):
    """bool [..., H, W]: component area >= min_area, via the run table.
    Exact iff every row has <= K runs (callers guard with
    max_runs_per_row).

    Route-back is BIT-PACKED: the per-run keep flags of a row fit in
    ceil(K/32) int32 words, so each pixel reads its flag as
    (word[run_index >> 5] >> (run_index & 31)) & 1 where run_index is
    one cumsum of is_start — no merge-sort positional scatter and no
    cummax run broadcast (those two cost 12.0 of the lane's 20.8 ms at
    bs64@512^2 on chip; the packed read is ~2 full-plane passes)."""
    H, W = labels.shape[-2:]
    size = H * W
    label_c, start_c, rowlen_c, valid, is_start = _run_table(
        labels, size, K, pre)
    s, area, q_s = _run_areas_sorted(label_c, rowlen_c, H, W, K)
    keep = ((area >= jnp.int32(min_area)) & (s < size)).astype(jnp.int32)
    # un-sort the keep bit to run-table order: q is a permutation, pack
    # the flag into its key (the connected_components.py idiom)
    packed = lax.sort(q_s * 2 + keep, dimension=-1, is_stable=False)
    keep_c = (packed & 1).reshape(*labels.shape[:-2], H, K)

    # pack row k-slots into int32 words [..., H, n_words]
    n_words = (K + 31) // 32
    words = []
    for w in range(n_words):
        chunk = keep_c[..., w * 32:(w + 1) * 32]
        shifts = jnp.arange(chunk.shape[-1], dtype=jnp.int32)
        words.append(jnp.sum(chunk << shifts, axis=-1))

    fg = pre[0] if pre is not None else labels < size
    # run index of each pixel within its row (0-based; valid on fg)
    r = lax.cumsum(is_start.astype(jnp.int32), axis=is_start.ndim - 1) - 1
    shift = r & 31
    widx = r >> 5
    out = jnp.zeros(labels.shape, jnp.int32)
    for w, word in enumerate(words):
        out = out + jnp.where(widx == w,
                              (word[..., None] >> shift) & 1, 0)
    return (out.astype(bool)) & fg


def rle_area_plane(labels, K: int):
    """s32 [..., H, W]: component area at every fg pixel (0 on bg), via
    the run table. Exact iff every row has <= K runs."""
    H, W = labels.shape[-2:]
    size = H * W
    bits_area = _bits_for(size)
    label_c, start_c, rowlen_c, valid, is_start = _run_table(
        labels, size, K)
    s, area, q_s = _run_areas_sorted(label_c, rowlen_c, H, W, K)
    area = jnp.where(s < size, area, 0)
    # area does not fit beside q in one s32 at 512^2 — 2-operand unsort
    _, area_c = lax.sort((q_s, area), dimension=-1, num_keys=1,
                         is_stable=False)
    area_c = area_c.reshape(*labels.shape[:-2], H, K)
    area_at_start = _scatter_to_starts(area_c, start_c, is_start)
    return _broadcast_along_runs(area_at_start, is_start, labels < size,
                                 bits_v=bits_area)


def rle_largest_label(labels, K: int, pre=None):
    """(best_label, best_area) per image — reductions in run space, no
    un-sort or route-back needed. Ties on area -> min label (cv2's
    first-encountered rule, as in keep_largest_component)."""
    H, W = labels.shape[-2:]
    size = H * W
    label_c, start_c, rowlen_c, valid, is_start = _run_table(
        labels, size, K, pre)
    s, area, _ = _run_areas_sorted(label_c, rowlen_c, H, W, K)
    area = jnp.where(s < size, area, 0)
    best_area = jnp.max(area, axis=-1)
    tied = area == best_area[..., None]
    best_label = jnp.min(jnp.where(tied & (s < size), s, size), axis=-1)
    return best_label, best_area
