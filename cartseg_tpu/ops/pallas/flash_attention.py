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

Forward-only (the TPU SAM predictor is inference; grads fall back to
the XLA lane). Mosaic constraints honored per CLAUDE.md: rank>=2
everywhere, one reduction axis at a time, lane tiles of 128 built from
whole grid rows (kb_rows = 128 // g rows per step), fp32 softmax
accumulation regardless of input dtype (official SAM numerics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from cartseg_tpu.ops.pallas.common import interpret_mode

_LANES = 128
_NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *, scale: float,
            g: int, kb_rows: int):
    q = q_ref[0].astype(jnp.float32)          # (BQ, hd)
    rh = rh_ref[0].astype(jnp.float32)        # (BQ, g)
    rw = rw_ref[0].astype(jnp.float32)        # (BQ, g)
    bq, hd = q.shape
    lanes = kb_rows * g
    n_kb = k_ref.shape[1] // lanes

    # rel_w repeats across the kb_rows grid rows of every K tile —
    # hoisted out of the loop. E spreads the selected rel_h columns
    # over their g-lane groups: E[j, l] = 1 iff l // g == j (constant).
    rw_tiled = rw if kb_rows == 1 else jnp.concatenate([rw] * kb_rows,
                                                       axis=1)
    e_row = jax.lax.broadcasted_iota(jnp.int32, (kb_rows, lanes), 0)
    e_lane = jax.lax.broadcasted_iota(jnp.int32, (kb_rows, lanes), 1)
    E = (e_lane // g == e_row).astype(jnp.float32)    # (kb_rows, lanes)

    def body(kb, carry):
        m, l, acc = carry
        kt = k_ref[0, pl.ds(kb * lanes, lanes), :]    # (lanes, hd)
        vt = v_ref[0, pl.ds(kb * lanes, lanes), :]
        logits = jax.lax.dot_general(
            q, kt.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        # decomposed bias for these kb_rows grid rows: each row j
        # contributes g lanes of rel_h[:, kb*kb_rows + j] + rel_w.
        # Mosaic cannot dynamic_slice a register value, so the dynamic
        # column pick is an exact one-hot matmul (0/1 selector => the
        # MXU sum has a single nonzero term, bitwise equal to a slice).
        hsel = jax.lax.broadcasted_iota(jnp.int32, (g, kb_rows), 0)
        jsel = jax.lax.broadcasted_iota(jnp.int32, (g, kb_rows), 1)
        sel = (hsel == kb * kb_rows + jsel).astype(jnp.float32)
        rh_sel = jax.lax.dot_general(                 # (BQ, kb_rows)
            rh, sel, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        bias = jax.lax.dot_general(                   # (BQ, lanes)
            rh_sel, E, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + rw_tiled
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
    _, l, acc = jax.lax.fori_loop(0, n_kb, body, (m0, l0, a0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def supported(grid_size: int, seq: int, head_dim: int) -> bool:
    """Shapes this kernel's tiling can serve (SAM global blocks do)."""
    kb_rows = max(1, _LANES // grid_size)
    lanes = kb_rows * grid_size
    return (grid_size * grid_size == seq and seq % lanes == 0
            and head_dim % 8 == 0 and seq >= lanes)


@functools.partial(jax.jit, static_argnames=("scale", "grid_size"))
def flash_attention_relpos(q, k, v, rel_h, rel_w, *, scale: float,
                           grid_size: int):
    """softmax(q @ k^T * scale + bias) @ v without materializing the
    (bnh, S, S) logits, where bias[i, kh*g+kw] = rel_h[i, kh] +
    rel_w[i, kw].

    q, k, v: (bnh, S, head_dim) with S == grid_size**2;
    rel_h, rel_w: (bnh, S, grid_size). Returns (bnh, S, head_dim) in
    q's dtype. Forward-only (no custom VJP) — inference path.
    """
    bnh, S, hd = q.shape
    g = grid_size
    assert supported(g, S, hd), (g, S, hd)
    kb_rows = max(1, _LANES // g)
    bq = min(S, 256)
    while S % bq:
        bq //= 2
    n_q = S // bq

    kernel = functools.partial(_kernel, scale=scale, g=g, kb_rows=kb_rows)
    return pl.pallas_call(
        kernel,
        grid=(bnh, n_q),
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, S, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, S, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, bq, g), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, bq, g), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, hd), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bnh, S, hd), q.dtype),
        interpret=interpret_mode(),
    )(q, k, v, rel_h, rel_w)
