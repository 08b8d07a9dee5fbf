"""Flash attention with decomposed rel-pos bias vs the plain XLA
attention oracle (the SAM ViT global-block hot path). Interpret mode
on CPU; the compiled-Mosaic run is in tools/run_chip_parity.py."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cartseg_tpu.ops.pallas.flash_attention import (
    flash_attention_relpos, supported,
)


def _oracle(q, k, v, rel_h, rel_w, scale):
    logits = (q * scale) @ jnp.swapaxes(k, 1, 2)
    g = rel_h.shape[-1]
    bias = rel_h[:, :, :, None] + rel_w[:, :, None, :]
    logits = logits + bias.reshape(logits.shape)
    a = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return (a.astype(v.dtype) @ v).astype(q.dtype)


def _inputs(g, hd, bnh=3, dtype=jnp.float32, seed=0):
    S = g * g
    ks = jax.random.split(jax.random.key(seed), 5)
    q = jax.random.normal(ks[0], (bnh, S, hd), dtype)
    k = jax.random.normal(ks[1], (bnh, S, hd), dtype)
    v = jax.random.normal(ks[2], (bnh, S, hd), dtype)
    # rel factors are O(1) like the einsum products in practice
    rh = 0.5 * jax.random.normal(ks[3], (bnh, S, g), dtype)
    rw = 0.5 * jax.random.normal(ks[4], (bnh, S, g), dtype)
    return q, k, v, rh, rw


@pytest.mark.parametrize("g,hd", [(16, 32), (16, 64), (32, 64)])
def test_matches_xla_oracle_fp32(g, hd):
    q, k, v, rh, rw = _inputs(g, hd)
    scale = hd ** -0.5
    out = flash_attention_relpos(q, k, v, rh, rw, scale=scale,
                                 grid_size=g)
    # bias reshape in oracle: (bnh, S, g, g) -> (bnh, S, S) row-major,
    # i.e. lane index = kh*g + kw, the kernel's layout
    ref = _oracle(q, k, v, rh.astype(jnp.float32),
                  rw.astype(jnp.float32), scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_matches_oracle_bf16():
    q, k, v, rh, rw = _inputs(16, 64, dtype=jnp.bfloat16, seed=1)
    out = flash_attention_relpos(q, k, v, rh, rw, scale=0.125,
                                 grid_size=16).astype(jnp.float32)
    ref = _oracle(q, k, v, rh, rw, 0.125).astype(jnp.float32)
    rel = float(jnp.abs(out - ref).max() / (jnp.abs(ref).max() + 1e-9))
    assert rel < 0.03, rel


def test_supported_predicate():
    assert supported(64, 4096, 64)        # ViT-B global block
    assert supported(16, 256, 64)         # small test config
    assert not supported(14, 196, 64)     # windowed block: not served
    assert not supported(64, 4095, 64)


def test_vit_attention_flash_matches_xla():
    """The full ViTAttention module, flash vs XLA lane, same params."""
    from cartseg_tpu.models.sam import ViTAttention

    x = jax.random.normal(jax.random.key(2), (1, 16, 16, 64))
    a_ref = ViTAttention(64, 2, 16, dtype=jnp.float32, use_flash=False)
    a_fl = ViTAttention(64, 2, 16, dtype=jnp.float32, use_flash=True)
    var = a_ref.init(jax.random.key(3), x)
    var = jax.tree_util.tree_map(
        lambda a: 0.1 * jax.random.normal(jax.random.key(4), a.shape),
        var)
    y_ref = a_ref.apply(var, x)
    y_fl = a_fl.apply(var, x)
    np.testing.assert_allclose(np.asarray(y_fl), np.asarray(y_ref),
                               atol=3e-5, rtol=3e-5)


def test_encoder_flag_end_to_end():
    """SamConfig.global_attn_flash routes only the global blocks."""
    from cartseg_tpu.models.sam import ImageEncoderViT, SamConfig

    cfg = SamConfig(img_size=256, patch_size=16, encoder_dim=64,
                    encoder_depth=2, encoder_heads=2,
                    global_attn_indexes=(1,), window_size=4)
    from cartseg_tpu.ops.pallas.flash_attention import supported
    assert supported(cfg.embed_hw, cfg.embed_hw ** 2, 32)
    cfg_f = dataclasses.replace(cfg, global_attn_flash=True)
    enc = ImageEncoderViT(cfg, jnp.float32)
    enc_f = ImageEncoderViT(cfg_f, jnp.float32)
    x = jax.random.normal(jax.random.key(5), (1, 256, 256, 3))
    var = enc.init(jax.random.key(6), x)
    var = jax.tree_util.tree_map(
        lambda a: 0.05 * jax.random.normal(jax.random.key(7), a.shape),
        var)
    y = enc.apply(var, x)
    y_f = enc_f.apply(var, x)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y),
                               atol=5e-5, rtol=5e-5)


# ------------------------------------------------------- custom VJP

@pytest.mark.parametrize("g,hd", [(16, 32), (16, 64)])
def test_vjp_matches_oracle_grads_fp32(g, hd):
    """All five gradients (dq, dk, dv, drel_h, drel_w) of the flash
    kernel's custom VJP vs jax autodiff of the XLA oracle."""
    q, k, v, rh, rw = _inputs(g, hd, bnh=2, seed=3)
    scale = hd ** -0.5
    key = jax.random.key(9)
    cot = jax.random.normal(key, q.shape)  # random cotangent

    def loss_flash(q, k, v, rh, rw):
        o = flash_attention_relpos(q, k, v, rh, rw, scale=scale,
                                   grid_size=g)
        return jnp.sum(o * cot)

    def loss_ref(q, k, v, rh, rw):
        return jnp.sum(_oracle(q, k, v, rh, rw, scale) * cot)

    g_fl = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4))(q, k, v, rh, rw)
    g_rf = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, rh, rw)
    for a, b, name in zip(g_fl, g_rf, ("dq", "dk", "dv", "drh", "drw")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5, err_msg=name)


def test_vjp_primal_matches_forward():
    """value_and_grad's primal equals the inference forward output."""
    q, k, v, rh, rw = _inputs(16, 32, bnh=1, seed=4)

    def f(q):
        o = flash_attention_relpos(q, k, v, rh, rw, scale=0.25,
                                   grid_size=16)
        return jnp.sum(o ** 2), o

    (_, o_grad), _ = jax.value_and_grad(f, has_aux=True)(q)
    o_inf = flash_attention_relpos(q, k, v, rh, rw, scale=0.25,
                                   grid_size=16)
    np.testing.assert_allclose(np.asarray(o_grad), np.asarray(o_inf),
                               atol=1e-6, rtol=1e-6)


def test_vit_attention_flash_grads_match_xla():
    """ViTAttention param/input grads, flash lane vs XLA lane."""
    from cartseg_tpu.models.sam import ViTAttention

    x = jax.random.normal(jax.random.key(12), (1, 16, 16, 64))
    a_ref = ViTAttention(64, 2, 16, dtype=jnp.float32, use_flash=False)
    a_fl = ViTAttention(64, 2, 16, dtype=jnp.float32, use_flash=True)
    var = a_ref.init(jax.random.key(13), x)
    var = jax.tree_util.tree_map(
        lambda a: 0.1 * jax.random.normal(jax.random.key(14), a.shape),
        var)

    def loss(mod):
        return lambda v, xx: jnp.sum(mod.apply(v, xx) ** 2)

    gv_ref, gx_ref = jax.grad(loss(a_ref), argnums=(0, 1))(var, x)
    gv_fl, gx_fl = jax.grad(loss(a_fl), argnums=(0, 1))(var, x)
    np.testing.assert_allclose(np.asarray(gx_fl), np.asarray(gx_ref),
                               atol=5e-5, rtol=5e-5)
    flat_ref = jax.tree_util.tree_leaves_with_path(gv_ref)
    flat_fl = dict(jax.tree_util.tree_leaves_with_path(gv_fl))
    for path, leaf in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_fl[path]), np.asarray(leaf),
            atol=5e-5, rtol=5e-5, err_msg=str(path))
