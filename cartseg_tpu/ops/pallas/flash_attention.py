"""Flash attention with decomposed relative-position bias — the SAM
ViT global-attention blocks' hot path.

The reference runs SAM through the stock `segment_anything` CUDA
package whose ViT attention materializes the full (B*heads, S, S)
logits tensor (S = 64*64 = 4096 for ViT-B at 1024²): ~805 MB of fp32
HBM traffic per global block, written, softmaxed and re-read just to
be contracted away against V. This kernel never materializes it: a
grid walks (batch*heads, q-blocks), K/V stay VMEM-resident per head,
and an online-softmax fori_loop streams 128-lane K/V tiles — the
classic flash-attention recurrence, plus SAM's decomposed bias
rebuilt on the fly from its two small factors:

    bias[q, kh*g + kw] = rel_h[q, kh] + rel_w[q, kw]

where rel_h/rel_w are the (bnh, S, g) einsum factors the XLA path
already computes (models/sam.py `_add_decomposed_rel_pos`) — g=64, so
they are ~12 MB total where the materialized bias alone would be
805 MB.

Trainable: a custom VJP backed by two more Pallas kernels (the
classic flash-attention backward, Dao et al. 2022 recomputation form):
the forward also emits the per-row logsumexp; the backward recomputes
P = exp(logits - lse) tile by tile and accumulates
  dV = P^T dO,   dS = P * (dO V^T - D),   D = rowsum(dO * O),
  dQ = scale * dS K,   dK = scale * dS^T Q,
plus the decomposed-bias gradients (dbias = dS collapsed per group):
  drel_h[i, kh] = sum_kw dS[i, kh*g+kw],
  drel_w[i, kw] = sum_kh dS[i, kh*g+kw],
both as 0/1 selector matmuls (no in-kernel reshapes).

Mosaic constraints honored per CLAUDE.md: rank>=2 everywhere, one
reduction axis at a time, lane tiles of 128 built from whole grid rows
(kb_rows = 128 // g rows per step), fp32 softmax accumulation
regardless of input dtype (official SAM numerics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from cartseg_tpu.ops.pallas.common import interpret_mode

_LANES = 128
_NEG_INF = -1e30


def _selectors(g: int, kb_rows: int):
    """Constant 0/1 matrices for the decomposed bias (and its grad).

    E (kb_rows, lanes): E[j, l] = 1 iff l // g == j — spreads a
    per-grid-row value over its g-lane group (fwd) / sums each group
    (bwd, transposed contraction).
    G (lanes, g): G[l, kw] = 1 iff l % g == kw — sums the kb_rows
    groups lane-position-wise (drel_w)."""
    lanes = kb_rows * g
    e_row = jax.lax.broadcasted_iota(jnp.int32, (kb_rows, lanes), 0)
    e_lane = jax.lax.broadcasted_iota(jnp.int32, (kb_rows, lanes), 1)
    E = (e_lane // g == e_row).astype(jnp.float32)
    g_lane = jax.lax.broadcasted_iota(jnp.int32, (lanes, g), 0)
    g_kw = jax.lax.broadcasted_iota(jnp.int32, (lanes, g), 1)
    G = (g_lane % g == g_kw).astype(jnp.float32)
    return E, G


def _bias_tile(rh, rw_tiled, E, kb, g: int, kb_rows: int):
    """Decomposed bias for the kb-th K tile (covers grid rows
    [kb*kb_rows, (kb+1)*kb_rows), all kw): each row j contributes g
    lanes of rel_h[:, kb*kb_rows + j] + rel_w. Mosaic cannot
    dynamic_slice a register value, so the dynamic column pick is an
    exact one-hot matmul (0/1 selector => the MXU sum has a single
    nonzero term, bitwise equal to a slice)."""
    hsel = jax.lax.broadcasted_iota(jnp.int32, (g, kb_rows), 0)
    jsel = jax.lax.broadcasted_iota(jnp.int32, (g, kb_rows), 1)
    sel = (hsel == kb * kb_rows + jsel).astype(jnp.float32)
    rh_sel = jax.lax.dot_general(                 # (BQ, kb_rows)
        rh, sel, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return jax.lax.dot_general(                   # (BQ, lanes)
        rh_sel, E, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + rw_tiled, sel


def _kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, lse_ref=None, *,
            scale: float, g: int, kb_rows: int):
    q = q_ref[0].astype(jnp.float32)          # (BQ, hd)
    rh = rh_ref[0].astype(jnp.float32)        # (BQ, g)
    rw = rw_ref[0].astype(jnp.float32)        # (BQ, g)
    bq, hd = q.shape
    lanes = kb_rows * g
    n_kb = k_ref.shape[1] // lanes

    # rel_w repeats across the kb_rows grid rows of every K tile —
    # hoisted out of the loop.
    rw_tiled = rw if kb_rows == 1 else jnp.concatenate([rw] * kb_rows,
                                                       axis=1)
    E, _ = _selectors(g, kb_rows)

    def body(kb, carry):
        m, l, acc = carry
        kt = k_ref[0, pl.ds(kb * lanes, lanes), :]    # (lanes, hd)
        vt = v_ref[0, pl.ds(kb * lanes, lanes), :]
        logits = jax.lax.dot_general(
            q, kt.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        bias, _ = _bias_tile(rh, rw_tiled, E, kb, g, kb_rows)
        logits = logits + bias

        m_new = jnp.maximum(m, jnp.max(logits, axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new)                   # (BQ, lanes) fp32
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p, vt.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc * alpha + pv

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    a0 = jnp.zeros((bq, hd), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_kb, body, (m0, l0, a0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    if lse_ref is not None:
        lse_ref[0] = m + jnp.log(l)                   # (BQ, 1) fp32


def supported(grid_size: int, seq: int, head_dim: int) -> bool:
    """Shapes this kernel's tiling can serve (SAM global blocks do)."""
    kb_rows = max(1, _LANES // grid_size)
    lanes = kb_rows * grid_size
    return (grid_size * grid_size == seq and seq % lanes == 0
            and head_dim % 8 == 0 and seq >= lanes)


def _tiling(S: int, g: int):
    kb_rows = max(1, _LANES // g)
    bq = min(S, 256)
    while S % bq:
        bq //= 2
    return kb_rows, bq


def _fwd_call(q, k, v, rel_h, rel_w, scale: float, g: int,
              with_lse: bool):
    bnh, S, hd = q.shape
    assert supported(g, S, hd), (g, S, hd)
    kb_rows, bq = _tiling(S, g)
    n_q = S // bq

    kernel = functools.partial(_kernel, scale=scale, g=g, kb_rows=kb_rows)
    out_shape = [jax.ShapeDtypeStruct((bnh, S, hd), q.dtype)]
    out_specs = [pl.BlockSpec((1, bq, hd), lambda b, i: (b, i, 0))]
    if with_lse:
        out_shape.append(jax.ShapeDtypeStruct((bnh, S, 1), jnp.float32))
        out_specs.append(pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0)))
    res = pl.pallas_call(
        kernel,
        grid=(bnh, n_q),
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, S, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, S, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, bq, g), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, bq, g), lambda b, i: (b, i, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret_mode(),
    )(q, k, v, rel_h, rel_w)
    return tuple(res) if with_lse else (res[0], None)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, do_ref, lse_ref,
                   dd_ref, dq_ref, drh_ref, drw_ref, *, scale: float,
                   g: int, kb_rows: int):
    """dQ / drel_h / drel_w for one q-block (recomputes P per K tile)."""
    q = q_ref[0].astype(jnp.float32)          # (BQ, hd)
    rh = rh_ref[0].astype(jnp.float32)        # (BQ, g)
    rw = rw_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)        # (BQ, hd)
    lse = lse_ref[0]                          # (BQ, 1) fp32
    dd = dd_ref[0]                            # (BQ, 1) fp32  D=rowsum(dO*O)
    bq, hd = q.shape
    lanes = kb_rows * g
    n_kb = k_ref.shape[1] // lanes

    rw_tiled = rw if kb_rows == 1 else jnp.concatenate([rw] * kb_rows,
                                                       axis=1)
    E, G = _selectors(g, kb_rows)

    def body(kb, carry):
        dq, drh, drw = carry
        kt = k_ref[0, pl.ds(kb * lanes, lanes), :].astype(jnp.float32)
        vt = v_ref[0, pl.ds(kb * lanes, lanes), :].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, kt, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        bias, sel = _bias_tile(rh, rw_tiled, E, kb, g, kb_rows)
        p = jnp.exp(logits + bias - lse)              # (BQ, lanes)
        dp = jax.lax.dot_general(                     # dO @ V^T
            do, vt, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - dd)                            # (BQ, lanes)
        dq = dq + jax.lax.dot_general(                # ds @ K * scale
            ds, kt, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        drw = drw + jax.lax.dot_general(              # sum over kh groups
            ds, G, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        grp = jax.lax.dot_general(                    # (BQ, kb_rows)
            ds, E, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        drh = drh + jax.lax.dot_general(              # scatter to kh cols
            grp, sel, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dq, drh, drw

    z_dq = jnp.zeros((bq, hd), jnp.float32)
    z_dr = jnp.zeros((bq, g), jnp.float32)
    dq, drh, drw = jax.lax.fori_loop(0, n_kb, body, (z_dq, z_dr, z_dr))
    dq_ref[0] = dq.astype(dq_ref.dtype)
    drh_ref[0] = drh.astype(drh_ref.dtype)
    drw_ref[0] = drw.astype(drw_ref.dtype)


def _bwd_dkv_kernel(k_ref, v_ref, q_ref, rh_ref, rw_ref, do_ref, lse_ref,
                    dd_ref, dk_ref, dv_ref, *, scale: float, g: int,
                    kb_rows: int, bq: int):
    """dK / dV for one K tile (the kb-th lane tile = grid index 1),
    streaming all q-blocks."""
    kb = pl.program_id(1)
    kt = k_ref[0].astype(jnp.float32)         # (lanes, hd)
    vt = v_ref[0].astype(jnp.float32)
    lanes, hd = kt.shape
    n_q = q_ref.shape[1] // bq
    E, _ = _selectors(g, kb_rows)

    def body(qb, carry):
        dk, dv = carry
        qt = q_ref[0, pl.ds(qb * bq, bq), :].astype(jnp.float32)
        rh = rh_ref[0, pl.ds(qb * bq, bq), :].astype(jnp.float32)
        rw = rw_ref[0, pl.ds(qb * bq, bq), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(qb * bq, bq), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(qb * bq, bq), :]
        dd = dd_ref[0, pl.ds(qb * bq, bq), :]
        rw_tiled = rw if kb_rows == 1 else jnp.concatenate(
            [rw] * kb_rows, axis=1)
        logits = jax.lax.dot_general(
            qt, kt, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        bias, _ = _bias_tile(rh, rw_tiled, E, kb, g, kb_rows)
        p = jnp.exp(logits + bias - lse)              # (BQ, lanes)
        dv = dv + jax.lax.dot_general(                # P^T @ dO
            p, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, vt, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - dd)
        dk = dk + jax.lax.dot_general(                # ds^T @ Q * scale
            ds, qt, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        return dk, dv

    z = jnp.zeros((lanes, hd), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, n_q, body, (z, z))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_call(res, do, scale: float, g: int):
    q, k, v, rel_h, rel_w, o, lse = res
    bnh, S, hd = q.shape
    kb_rows, bq = _tiling(S, g)
    lanes = kb_rows * g
    n_q, n_kb = S // bq, S // lanes
    # D = rowsum(dO * O): one cheap fused XLA pass, shared by both
    # backward kernels (Dao et al.'s delta precomputation)
    dd = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                 axis=-1, keepdims=True)

    dq_kernel = functools.partial(_bwd_dq_kernel, scale=scale, g=g,
                                  kb_rows=kb_rows)
    dq, drh, drw = pl.pallas_call(
        dq_kernel,
        grid=(bnh, n_q),
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, S, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, S, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, bq, g), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, bq, g), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, bq, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, bq, g), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, bq, g), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bnh, S, hd), q.dtype),
            jax.ShapeDtypeStruct((bnh, S, g), rel_h.dtype),
            jax.ShapeDtypeStruct((bnh, S, g), rel_w.dtype),
        ],
        interpret=interpret_mode(),
    )(q, k, v, rel_h, rel_w, do, lse, dd)

    dkv_kernel = functools.partial(_bwd_dkv_kernel, scale=scale, g=g,
                                   kb_rows=kb_rows, bq=bq)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(bnh, n_kb),
        in_specs=[
            pl.BlockSpec((1, lanes, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, lanes, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, S, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, S, g), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, S, g), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, S, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, S, 1), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, S, 1), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, lanes, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, lanes, hd), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bnh, S, hd), k.dtype),
            jax.ShapeDtypeStruct((bnh, S, hd), v.dtype),
        ],
        interpret=interpret_mode(),
    )(k, v, q, rel_h, rel_w, do, lse, dd)
    return dq, dk, dv, drh, drw


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash(q, k, v, rel_h, rel_w, scale, grid_size):
    o, _ = _fwd_call(q, k, v, rel_h, rel_w, scale, grid_size,
                     with_lse=False)
    return o


def _flash_fwd(q, k, v, rel_h, rel_w, scale, grid_size):
    o, lse = _fwd_call(q, k, v, rel_h, rel_w, scale, grid_size,
                       with_lse=True)
    return o, (q, k, v, rel_h, rel_w, o, lse)


def _flash_bwd(scale, grid_size, res, do):
    return _bwd_call(res, do, scale, grid_size)


_flash.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.jit, static_argnames=("scale", "grid_size"))
def flash_attention_relpos(q, k, v, rel_h, rel_w, *, scale: float,
                           grid_size: int):
    """softmax(q @ k^T * scale + bias) @ v without materializing the
    (bnh, S, S) logits, where bias[i, kh*g+kw] = rel_h[i, kh] +
    rel_w[i, kw].

    q, k, v: (bnh, S, head_dim) with S == grid_size**2;
    rel_h, rel_w: (bnh, S, grid_size). Returns (bnh, S, head_dim) in
    q's dtype. Differentiable: a custom VJP (flash backward, see
    module docstring) — the inference forward skips the logsumexp
    write; under `jax.grad` the VJP forward emits it for the backward
    kernels.
    """
    return _flash(q, k, v, rel_h, rel_w, scale, grid_size)
