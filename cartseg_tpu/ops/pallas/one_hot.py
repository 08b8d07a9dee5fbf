"""Smoothed one-hot Pallas kernel — one_hot_kernel.cu (`label_one_hot`,
:351-352): labels -> lb_neg-filled rows with lb_pos at the label,
ignored rows all-zero. Positions ride the lane axis (labels as
(1, TILE) rows, output channels-first (C, TILE)); Mosaic rejects 1-D
vectors."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cartseg_tpu.ops.pallas.common import interpret_mode, cdiv

_TILE = 1024


def _kernel(labels_ref, out_ref, *, num_classes, lb_smooth, ignore_index):
    lab = labels_ref[:]                        # [1, T]
    T = lab.shape[1]
    lb_pos = 1.0 - lb_smooth
    lb_neg = lb_smooth / num_classes
    ignore = lab == ignore_index
    safe = jnp.where(ignore, 0, lab)
    rows = jax.lax.broadcasted_iota(jnp.int32, (num_classes, T), 0)
    oh = jnp.where(rows == safe, lb_pos, lb_neg)
    out_ref[:] = jnp.where(ignore, 0.0, oh)


def smooth_one_hot_pallas(labels, num_classes: int, lb_smooth: float = 0.1,
                          ignore_index: int = -100):
    shape = labels.shape
    lab = jnp.asarray(labels, jnp.int32).reshape(-1)
    n = lab.shape[0]
    n_pad = cdiv(n, _TILE) * _TILE - n
    if n_pad:
        lab = jnp.pad(lab, (0, n_pad))
    out = pl.pallas_call(
        functools.partial(_kernel, num_classes=num_classes,
                          lb_smooth=lb_smooth, ignore_index=ignore_index),
        out_shape=jax.ShapeDtypeStruct((num_classes, lab.shape[0]),
                                       jnp.float32),
        grid=(lab.shape[0] // _TILE,),
        in_specs=[pl.BlockSpec((1, _TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((num_classes, _TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
    )(lab[None, :])
    return out.T[:n].reshape(shape + (num_classes,))
