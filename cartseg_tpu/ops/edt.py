"""Euclidean distance transform on device via jump flooding (JFA).

The reference computes EDT on the host with scipy, per sample, per
training step, inside the ABL and boundary losses — its author's own
comment calls it out as the training bottleneck
(src/training/losses/abl.py:197). Here the transform is a fixed
sequence of log2(N)+2 vectorized shift-compare passes (JFA+1), fully
inside jit, batched with vmap — no host roundtrip.

Accuracy: 1+JFA is exact on the overwhelming majority of pixels; rare
errors are bounded and tiny relative to the 20px clamp the losses apply
(abl.py:40). Parity vs scipy is asserted statistically in tests, and an
exact C++ host oracle lives in cartseg_tpu.native for offline use.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e12)


def _shift2d(x, dy: int, dx: int, fill):
    """Shift a 2-D array by (dy, dx), filling vacated cells — one
    concat kernel per axis (roll + border .at[].set costs an extra
    full-plane dynamic-update-slice per shift; see
    connected_components._shift_fill)."""
    from cartseg_tpu.ops.connected_components import (
        _shift_fill as _sf)
    return _sf(x, dy, dx, fill)


def edt(seeds, return_indices: bool = False):
    """Distance from every pixel to the nearest True pixel of `seeds`
    (HxW bool). Returns float32 HxW (and optionally the nearest-seed
    (y, x) int32 maps). If `seeds` has no True pixel the result is +inf
    everywhere (callers guard with `seeds.any()`)."""
    seeds = jnp.asarray(seeds, bool)
    H, W = seeds.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    by = jnp.where(seeds, ys, 0)
    bx = jnp.where(seeds, xs, 0)
    d2 = jnp.where(seeds, 0.0, _INF).astype(jnp.float32)

    def sweep(state, k: int):
        by, bx, d2 = state
        for dy in (-k, 0, k):
            for dx in (-k, 0, k):
                if dy == 0 and dx == 0:
                    continue
                cby = _shift2d(by, dy, dx, 0)
                cbx = _shift2d(bx, dy, dx, 0)
                cd2 = _shift2d(d2, dy, dx, _INF)
                # candidate distance measured from *this* pixel
                nd2 = jnp.where(
                    cd2 < _INF,
                    ((ys - cby) ** 2 + (xs - cbx) ** 2).astype(jnp.float32),
                    _INF,
                )
                better = nd2 < d2
                by = jnp.where(better, cby, by)
                bx = jnp.where(better, cbx, bx)
                d2 = jnp.where(better, nd2, d2)
        return by, bx, d2

    n = max(H, W)
    k = 1
    while k * 2 < n:
        k *= 2
    steps = []
    while k >= 1:
        steps.append(k)
        k //= 2
    steps.append(1)  # the "+1" pass of 1+JFA

    state = (by, bx, d2)
    for k in steps:
        state = sweep(state, k)
    by, bx, d2 = state
    dist = jnp.sqrt(d2)
    if return_indices:
        return dist, (by, bx)
    return dist


def edt_batch(seeds):
    """[B,H,W] seeds -> [B,H,W] f32 distances. On TPU (and when the
    state fits VMEM) this runs the VMEM-resident Pallas flood
    (ops/pallas/edt.py — one HBM read + one write instead of ~80
    bandwidth-bound XLA passes); elsewhere the vmapped XLA JFA.
    Disable with CARTSEG_PALLAS_EDT=0."""
    import os

    import jax as _jax

    B, H, W = seeds.shape
    use_pallas = (os.environ.get("CARTSEG_PALLAS_EDT", "1") != "0"
                  and _jax.default_backend() == "tpu")
    if use_pallas:
        from cartseg_tpu.ops.pallas.edt import edt_batch_pallas, fits_vmem
        if fits_vmem(H, W):
            return edt_batch_pallas(seeds)
    return jax.vmap(edt)(jnp.asarray(seeds, bool))


def distance_transform_edt(mask):
    """scipy.ndimage.distance_transform_edt semantics: for each nonzero
    pixel of `mask`, distance to the nearest zero pixel; 0 on zeros.
    If mask is all-ones the scipy guard cases in the reference skip the
    call; here we return 0s (callers check `(~mask).any()`)."""
    mask = jnp.asarray(mask, bool)
    d = edt(~mask)
    d = jnp.where(mask, d, 0.0)
    return jnp.where(jnp.any(~mask), d, 0.0)
