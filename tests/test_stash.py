"""fp8 conv-residual stash (models/stash.py, VERDICT r4 #7).

Contract under test:
  * forward is BIT-identical with the stash on or off (the fp8 copy is
    written for backward, never read by forward);
  * dx is exact vs autodiff (it contracts only dy with the kernel);
  * dk equals autodiff's dk evaluated at the fp8-roundtripped input
    EXACTLY (the linear_transpose derivation is the same adjoint conv),
    and is close to the unquantized dk within fp8-e4m3 rounding;
  * the param tree is unchanged (same names/shapes as the nn.Conv
    modules StashConv replaced — checkpoint/torch-import compat).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cartseg_tpu.models.stash import F8, StashConv, conv_f8stash, _conv


@pytest.fixture
def stash_on():
    os.environ["CARTSEG_F8_STASH"] = "8"
    yield
    os.environ.pop("CARTSEG_F8_STASH", None)


def _rand(shape, seed=0, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape) * scale,
        jnp.float32)


@pytest.mark.parametrize("strides,pad,lhs_dil", [
    ((1, 1), ((1, 1), (1, 1)), (1, 1)),
    ((2, 2), ((3, 3), (3, 3)), (1, 1)),
    ((1, 1), ((2, 2), (2, 2)), (2, 2)),  # fused-decoder transposed conv
])
def test_unit_grads_vs_autodiff(strides, pad, lhs_dil):
    kh = 7 if pad[0][0] == 3 else (4 if lhs_dil == (2, 2) else 3)
    x = _rand((2, 16, 16, 5), 1)
    k = _rand((kh, kh, 5, 6), 2, 0.2)

    def f_stash(x, k):
        return (conv_f8stash(x, k, strides, pad, lhs_dil) ** 2).sum()

    def f_plain(x, k):
        return (_conv(x, k, strides, pad, lhs_dil) ** 2).sum()

    y0 = conv_f8stash(x, k, strides, pad, lhs_dil)
    y1 = _conv(x, k, strides, pad, lhs_dil)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    dx_s, dk_s = jax.grad(f_stash, (0, 1))(x, k)
    dx_p, dk_p = jax.grad(f_plain, (0, 1))(x, k)
    # dx: exact (same adjoint conv over dy and k)
    np.testing.assert_allclose(np.asarray(dx_s), np.asarray(dx_p),
                               rtol=0, atol=0)
    # dk at the QUANTIZED input: exact vs autodiff of the plain conv
    # evaluated at the fp8 roundtrip of x — but the cotangent dy also
    # shifts when the primal shifts, so compare against autodiff where
    # only the residual x is quantized: grad_k of sum(conv(x,k)^2) with
    # the SAME y (dy = 2y from the unquantized forward)
    xq = x.astype(F8).astype(x.dtype)
    dy = 2.0 * y1
    dk_ref = jax.linear_transpose(
        lambda t: _conv(xq, t, strides, pad, lhs_dil),
        jax.ShapeDtypeStruct(k.shape, k.dtype))(dy)[0]
    np.testing.assert_allclose(np.asarray(dk_s), np.asarray(dk_ref),
                               rtol=0, atol=0)
    # and close to the unquantized dk within fp8 rounding (e4m3 keeps
    # ~3 mantissa bits -> ~6% per-element, much tighter on the sum)
    denom = np.abs(np.asarray(dk_p)).max() + 1e-9
    rel = np.abs(np.asarray(dk_s) - np.asarray(dk_p)).max() / denom
    assert rel < 0.08, rel


def test_stashconv_param_tree_matches_nn_conv():
    import flax.linen as nn

    sc = StashConv(6, (3, 3), strides=(2, 2), padding=1, use_bias=True,
                   dtype=jnp.bfloat16)
    ref = nn.Conv(6, (3, 3), strides=(2, 2), padding=1, use_bias=True,
                  dtype=jnp.bfloat16)
    x = _rand((1, 16, 16, 4), 3)
    ps = jax.tree_util.tree_map(
        lambda a: (a.shape, a.dtype), sc.init(jax.random.key(0), x))
    pr = jax.tree_util.tree_map(
        lambda a: (a.shape, a.dtype), ref.init(jax.random.key(0), x))
    assert ps == pr


def test_model_forward_bit_identical_and_grads_close(stash_on):
    from cartseg_tpu.models import build_model, init_model

    model = build_model("resnet34", dtype=jnp.bfloat16)
    v = init_model(model, jax.random.key(0), (1, 32, 32, 3))
    x = _rand((2, 32, 32, 3), 4)

    def loss(p, enabled):
        if not enabled:
            os.environ["CARTSEG_F8_STASH"] = "0"
        else:
            os.environ["CARTSEG_F8_STASH"] = "8"
        out, _ = model.apply(
            {"params": p, "batch_stats": v["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return (out.astype(jnp.float32) ** 2).mean()

    l_off, g_off = jax.value_and_grad(lambda p: loss(p, False))(v["params"])
    l_on, g_on = jax.value_and_grad(lambda p: loss(p, True))(v["params"])
    assert float(l_off) == float(l_on)

    offs = jax.tree_util.tree_leaves(g_off)
    ons = jax.tree_util.tree_leaves(g_on)
    rels = []
    for a, b in zip(offs, ons):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rels.append(np.abs(a - b).max() / (np.abs(a).max() + 1e-9))
    assert max(rels) < 0.15, max(rels)
    # the stash must actually engage: some kernels' dw shifts
    assert sum(r > 0 for r in rels) >= 4


def test_fused_decoder_stash_engages(stash_on):
    """The default (fused) decoder's conv1 lane routes through
    conv_f8stash when active — forward stays bit-identical."""
    from cartseg_tpu.models.unet import FusedUpsampleConv

    mod = FusedUpsampleConv(8, jnp.bfloat16)
    x = _rand((2, 8, 8, 4), 5).astype(jnp.bfloat16)
    skip = _rand((2, 16, 16, 6), 6).astype(jnp.bfloat16)
    p = mod.init(jax.random.key(0), x, skip)

    def out(enabled):
        os.environ["CARTSEG_F8_STASH"] = "8" if enabled else "0"
        return mod.apply(p, x, skip)

    a, b = out(False), out(True)
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(b, np.float32))

    def loss(p, enabled):
        os.environ["CARTSEG_F8_STASH"] = "8" if enabled else "0"
        return (mod.apply(p, x, skip).astype(jnp.float32) ** 2).sum()

    g0 = jax.grad(lambda q: loss(q, False))(p)
    g1 = jax.grad(lambda q: loss(q, True))(p)
    k0 = np.asarray(jax.tree_util.tree_leaves(g0)[0], np.float32)
    k1 = np.asarray(jax.tree_util.tree_leaves(g1)[0], np.float32)
    rel = np.abs(k0 - k1).max() / (np.abs(k0).max() + 1e-9)
    assert 0 < rel < 0.15, rel
