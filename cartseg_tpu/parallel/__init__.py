"""Parallelism: jax.sharding data-parallel mesh over ICI (+ multi-host
DCN hooks) — the scaling story the single-device reference lacks
(SURVEY.md section 2.5)."""

from cartseg_tpu.parallel.mesh import (
    data_mesh, batch_sharding, replicated_sharding, shard_batch, replicate,
    local_device_count, process_count, process_index,
    maybe_initialize_distributed, is_main_process, barrier, host_batch_slice,
)

__all__ = [
    "data_mesh", "batch_sharding", "replicated_sharding", "shard_batch",
    "replicate", "local_device_count", "process_count", "process_index",
    "maybe_initialize_distributed", "is_main_process", "barrier",
    "host_batch_slice",
]
