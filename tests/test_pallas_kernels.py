"""Tier-B Pallas kernels vs their Tier-A pure-XLA oracles — the
reference's own V1-vs-CUDA equivalence pattern
(label_smooth.py:180-259), forward AND gradient. On CPU these run
through the Pallas interpreter; on TPU they compile to Mosaic."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cartseg_tpu import losses as L
from cartseg_tpu.ops.pallas import (
    lsr_ce_pallas, focal_pallas, soft_dice_pallas,
    mish_pallas, swish_pallas, hswish_pallas, smooth_one_hot_pallas,
)


def test_lsr_pallas_forward(rng):
    logits = rng.normal(size=(2, 9, 9, 8)).astype(np.float32) * 3
    labels = rng.integers(0, 8, size=(2, 9, 9)).astype(np.int32)
    labels[0, :2, :2] = 255
    ours = np.asarray(lsr_ce_pallas(jnp.asarray(logits), jnp.asarray(labels),
                                    0.1, 255))
    ref = np.asarray(L.lsr_cross_entropy(jnp.asarray(logits),
                                         jnp.asarray(labels), 0.1,
                                         reduction="none",
                                         ignore_index=255))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_lsr_pallas_grad(rng):
    logits = rng.normal(size=(2, 9, 9, 8)).astype(np.float32)
    labels = rng.integers(0, 8, size=(2, 9, 9)).astype(np.int32)
    labels[1, 0, 0] = 255
    jl, jb = jnp.asarray(logits), jnp.asarray(labels)
    g1 = jax.grad(lambda x: jnp.sum(lsr_ce_pallas(x, jb, 0.1, 255) * 1.3))(jl)
    g2 = jax.grad(lambda x: jnp.sum(
        L.lsr_cross_entropy(x, jb, 0.1, reduction="none",
                            ignore_index=255) * 1.3))(jl)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_focal_pallas_forward_and_grad(rng):
    logits = rng.normal(size=(2, 17, 17, 1)).astype(np.float32) * 2
    targets = (rng.random((2, 17, 17, 1)) > 0.5).astype(np.float32)
    jl, jt = jnp.asarray(logits), jnp.asarray(targets)
    ours = np.asarray(focal_pallas(jl, jt, 2.0, 0.25))
    ref = np.asarray(L.focal_loss_kernel(jl, jt, 2.0, 0.25))
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    g1 = jax.grad(lambda x: jnp.sum(focal_pallas(x, jt, 2.0, 0.25)))(jl)
    g2 = jax.grad(lambda x: jnp.sum(L.focal_loss_kernel(x, jt, 2.0, 0.25)))(jl)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


@pytest.mark.parametrize("p", [1.0, 2.0])
def test_soft_dice_pallas(p, rng):
    logits = rng.normal(size=(3, 21, 21, 1)).astype(np.float32) * 2
    labels = (rng.random((3, 21, 21, 1)) > 0.5).astype(np.float32)
    jl, jt = jnp.asarray(logits), jnp.asarray(labels)
    ours = np.asarray(soft_dice_pallas(jl, jt, p, 1.0))
    ref = np.asarray(L.soft_dice_loss(jl, jt, p=p, smooth=1.0))
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    g1 = jax.grad(lambda x: jnp.sum(soft_dice_pallas(x, jt, p, 1.0)))(jl)
    g2 = jax.grad(lambda x: jnp.sum(L.soft_dice_loss(x, jt, p=p)))(jl)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("pair", [
    (mish_pallas, "mish"), (swish_pallas, "swish"), (hswish_pallas, "hswish"),
])
def test_activations_pallas(pair, rng):
    op, name = pair
    oracle = {"mish": L.mish, "swish": L.swish, "hswish": L.hswish}[name]
    x = rng.normal(size=(500,)).astype(np.float32) * 6
    jx = jnp.asarray(x)
    np.testing.assert_allclose(np.asarray(op(jx)), np.asarray(oracle(jx)),
                               atol=1e-5)
    g1 = jax.grad(lambda v: jnp.sum(op(v)))(jx)
    g2 = jax.grad(lambda v: jnp.sum(oracle(v)))(jx)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_smooth_one_hot_pallas(rng):
    labels = rng.integers(0, 8, size=(3, 10)).astype(np.int32)
    labels[0, 0] = 255
    ours = np.asarray(smooth_one_hot_pallas(jnp.asarray(labels), 8, 0.2, 255))
    ref = np.asarray(L.smooth_one_hot(jnp.asarray(labels), 8, 0.2, 255))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_activations_lane_aligned_path(rng):
    """2-D inputs with a 128-multiple minor dim take the no-relayout
    block mapping (docs/CHIP_PARITY.md: the flatten path costs ~1.1 ms
    relayout each way at 25M elements); parity must hold there too,
    including non-divisible row counts that fall back."""
    for shape in ((24, 256), (9, 128), (40, 384, 128)):
        x = rng.normal(size=shape).astype(np.float32) * 5
        jx = jnp.asarray(x)
        np.testing.assert_allclose(np.asarray(swish_pallas(jx)),
                                   np.asarray(L.swish(jx)), atol=1e-5)
        g1 = jax.grad(lambda v: jnp.sum(swish_pallas(v)))(jx)
        g2 = jax.grad(lambda v: jnp.sum(L.swish(v)))(jx)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=1e-5)
