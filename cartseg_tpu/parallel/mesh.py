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


def shard_inference_program(jitted_program, batch_size: int,
                            n_sharded_args: int = 1,
                            n_replicated_args: int = 0,
                            name: str = "inference", log=print):
    """Data-parallel wrapper for a jitted inference program with the
    train engine's loud-fallback semantics: returns
    (program, batch_sharding) with batch_sharding=None (program
    unchanged) on a single device or an indivisible batch (the latter
    WARNS rather than silently running slower than asked).

    When the mesh engages, the Mosaic (Pallas) lanes of the CC/median
    QC ops are forced to their XLA oracles for this process
    (CARTSEG_PALLAS_CC=0 / CARTSEG_PALLAS_MEDIAN=0, read at trace
    time): a pallas_call is an opaque custom call to the SPMD
    partitioner, which would REPLICATE it — all-gathering the sharded
    batch onto every chip — instead of partitioning it, so the Pallas
    lanes would silently erase the data-parallel speedup they were
    meant to ride (the same reason norm.py keeps flax BN as the
    mesh-correct default). The XLA lanes are plain jnp programs that
    GSPMD shards cleanly, and they double as the Pallas kernels' exact
    parity oracles, so results are unchanged."""
    import os
    import warnings

    n_dev = len(jax.devices())
    if n_dev <= 1:
        return jitted_program, None
    if batch_size % n_dev:
        warnings.warn(
            f"{name}: batch_size={batch_size} does not divide over the "
            f"{n_dev} visible devices — data-parallel mesh DISABLED; "
            f"running on ONE device. Pick batch_size a multiple of "
            f"{n_dev} or use_mesh=False to silence this.", stacklevel=3)
        return jitted_program, None
    os.environ["CARTSEG_PALLAS_CC"] = "0"
    os.environ["CARTSEG_PALLAS_MEDIAN"] = "0"
    mesh = data_mesh()
    sh = batch_sharding(mesh)
    rep = replicated_sharding(mesh)
    program = jax.jit(
        jitted_program.__wrapped__,
        in_shardings=(sh,) * n_sharded_args + (rep,) * n_replicated_args,
        out_shardings=sh)
    log(f"mesh: data-parallel over {n_dev} devices (XLA QC lanes)")
    return program, sh


def local_device_count() -> int:
    return jax.local_device_count()


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    """True on the process that owns filesystem side effects (metrics
    CSVs, checkpoints, synthetic-data trees). Mirrors the reference's
    implicit single-process assumption (train_bce_dice.py writes
    unconditionally); under jax.distributed only process 0 writes."""
    return jax.process_index() == 0


def barrier(name: str) -> None:
    """Cross-process sync point (no-op single-process). Used around
    checkpoint writes so non-main processes never read a half-written
    tree."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def host_batch_slice(n: int) -> slice:
    """This host's contiguous row range of a global batch of n rows.

    Global batches are composed identically to the single-process run:
    the epoch order stays global, and each host materialises only rows
    [h*k, (h+1)*k) of every batch (k = n / process_count). With the 1-D
    data mesh (devices grouped by process) those rows are exactly this
    host's addressable shards, so
    jax.make_array_from_process_local_data reassembles the same global
    batch the single-process run sees — per-host loading with exact
    step equivalence (tests/test_distributed.py)."""
    p, h = jax.process_count(), jax.process_index()
    if n % p:
        raise ValueError(f"global batch {n} not divisible by "
                         f"process_count {p}")
    k = n // p
    return slice(h * k, (h + 1) * k)
