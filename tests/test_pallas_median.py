"""Exact-median selection kernel (ops/pallas/median.py) vs np.median.

The kernel binary-searches int32 bit patterns for the two middle order
statistics — results must be bit-exact vs the sort-based oracle on
non-negative inputs (fg_conf feeds |p-0.5|*2).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cartseg_tpu.ops.pallas.median import (_median_pallas, fits_vmem,
                                           median_nonneg_last_axis)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("B,N", [(4, 1024), (3, 128 * 9), (2, 50176),
                                 (1, 128), (5, 128 * 7)])
def test_median_kernel_exact(B, N, rng):
    x = np.abs(rng.normal(size=(B, N))).astype(np.float32)
    x[0, : min(10, N)] = 0.0           # duplicate boundary values
    x[-1, -min(5, N):] = 1.0
    got = np.asarray(_median_pallas(jnp.asarray(x)))
    want = np.median(x, axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_median_kernel_odd_row(rng):
    # odd N: both bisections target the same order statistic
    x = np.abs(rng.normal(size=(2, 128 * 3))).astype(np.float32)
    x = x[:, : 128 * 3]
    got = np.asarray(_median_pallas(jnp.asarray(x)))
    np.testing.assert_allclose(got, np.median(x, axis=-1), atol=0)


def test_median_kernel_constant_rows():
    x = np.full((3, 1024), 0.25, np.float32)
    x[1] = 0.0
    got = np.asarray(_median_pallas(jnp.asarray(x)))
    np.testing.assert_allclose(got, [0.25, 0.0, 0.25], atol=0)


def test_wrapper_fallback_and_shapes(rng):
    # N not lane-aligned -> jnp.median fallback; leading dims preserved
    x = np.abs(rng.normal(size=(2, 3, 777))).astype(np.float32)
    assert not fits_vmem(777)
    got = np.asarray(median_nonneg_last_axis(jnp.asarray(x)))
    np.testing.assert_allclose(got, np.median(x, axis=-1), rtol=1e-6)
