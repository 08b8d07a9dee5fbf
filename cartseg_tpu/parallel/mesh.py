"""Data-parallel mesh utilities.

A 1-D `Mesh(('data',))` over all local (or all global) devices; batches
are sharded on the leading axis, params replicated. Under `jax.jit`
XLA's SPMD partitioner inserts the gradient all-reduce over ICI — no
hand-written collectives (scaling-book recipe: pick a mesh, annotate
shardings, let XLA insert collectives).

Multi-host: `maybe_initialize_distributed()` wires
jax.distributed.initialize() when the standard env vars are present;
per-host data loading is keyed by `process_index()` with the
deterministic splits of :mod:`cartseg_tpu.data.pairing` (every host
computes the same split, no coordination traffic — SURVEY.md section 5).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> bool:
    """Initialize multi-host JAX when coordinator env vars are set
    (JAX_COORDINATOR_ADDRESS / cloud TPU metadata). No-op otherwise."""
    if jax.process_count() > 1:
        return True
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        jax.distributed.initialize()
        return True
    return False


def data_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """device_put a (possibly nested) batch with leading-axis sharding."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def local_device_count() -> int:
    return jax.local_device_count()


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()
