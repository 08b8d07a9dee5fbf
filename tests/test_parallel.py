"""Data-parallel mesh: sharded-vs-single-device step equivalence on the
8-device CPU mesh, full Trainer.fit under sharding, and the driver's
multichip dryrun."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P, NamedSharding

from cartseg_tpu.parallel import (
    data_mesh, batch_sharding, replicated_sharding, shard_batch, replicate,
)


def test_mesh_has_8_devices():
    mesh = data_mesh()
    assert mesh.devices.size == 8


def test_sharded_grad_equals_single_device(rng):
    """The DP all-reduce XLA inserts must reproduce the single-device
    gradient exactly (mean-loss => grads average across shards)."""
    from cartseg_tpu.models import build_model, init_model
    from cartseg_tpu.losses import bce_dice_loss

    model = build_model("classic", dtype=jnp.float32)
    v = init_model(model, jax.random.key(0), (1, 16, 16, 3))
    x = rng.normal(size=(8, 16, 16, 3)).astype(np.float32)
    y = (rng.random((8, 16, 16, 1)) > 0.5).astype(np.float32)

    def loss_fn(params, x, y):
        out = model.apply({"params": params}, x)
        eps = 1e-6
        logits = jnp.log(out + eps) - jnp.log1p(-out + eps)
        return bce_dice_loss(logits, y)

    grad_fn = jax.jit(jax.grad(loss_fn))
    g_single = grad_fn(v["params"], jnp.asarray(x), jnp.asarray(y))

    mesh = data_mesh()
    params_r = replicate(v["params"], mesh)
    xb = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
    yb = jax.device_put(jnp.asarray(y), batch_sharding(mesh))
    g_sharded = jax.jit(
        jax.grad(loss_fn),
        in_shardings=(replicated_sharding(mesh), batch_sharding(mesh),
                      batch_sharding(mesh)),
        out_shardings=replicated_sharding(mesh),
    )(params_r, xb, yb)

    for a, b in zip(jax.tree_util.tree_leaves(g_single),
                    jax.tree_util.tree_leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_trainer_fit_on_mesh(tmp_path):
    """Full fit with batch 8 over the 8-device mesh."""
    from cartseg_tpu.train import TrainConfig, LossSpec, Trainer

    cfg = TrainConfig(
        encoder="resnet18", img_size=(32, 32), batch_size=8, epochs=1,
        lr=1e-3, synthetic=True, synthetic_sessions=2,
        synthetic_per_session=8, seed=0, loss=LossSpec("bce_dice"),
        augment="none", out_dir=str(tmp_path / "meshrun"), use_mesh=True)
    tr = Trainer(cfg)
    assert tr.mesh is not None and tr.mesh.devices.size == 8
    res = tr.fit(log=lambda *a: None)
    assert res["best_val_dice"] >= 0


def test_dryrun_multichip_entry():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 224, 224, 1)


def test_shard_for_host_partitions():
    from cartseg_tpu.data.pairing import shard_for_host
    idx = list(range(10))
    parts = [shard_for_host(idx, h, 4) for h in range(4)]
    assert sorted(sum(parts, [])) == idx
    assert parts[0] == [0, 4, 8]


def test_host_batch_slice_partitions_and_validates():
    """host_batch_slice: contiguous per-host row ranges that exactly
    partition a global batch; non-divisible batches are an error
    (parallel/mesh.py — the per-host loading contract of
    tests/test_distributed.py)."""
    from cartseg_tpu.parallel import host_batch_slice

    # single-process run: the slice is the whole batch (any size
    # divides process_count == 1, so no error path here; the
    # divisibility ValueError is multi-process-only and exercised by
    # construction in tests/test_distributed.py's worker config)
    s = host_batch_slice(8)
    assert list(range(8))[s] == list(range(8))
    assert list(range(7))[host_batch_slice(7)] == list(range(7))


def test_is_main_process_and_barrier_single_process():
    """Single-process: is_main_process() is True and barrier() is a
    no-op (multi-process behavior exercised in tests/test_distributed)."""
    from cartseg_tpu.parallel import barrier, is_main_process

    assert is_main_process()
    barrier("unit-test")  # must not hang or require peers
