"""Shared Pallas utilities."""

from __future__ import annotations

import jax


def interpret_mode() -> bool:
    """Run kernels through the interpreter off-TPU (CPU tests)."""
    return jax.default_backend() != "tpu"


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
