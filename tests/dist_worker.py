"""Subprocess worker for tests/test_distributed.py: one process of a
2-process jax.distributed run (4 CPU devices each -> 8 global), running
a full Trainer.fit over the global data mesh with per-host batch
loading (SURVEY.md section 2.5's multi-host DCN plan, exercised with a
real multi-controller runtime rather than a virtual single-process
mesh).

Usage:  python tests/dist_worker.py <process_id> <port> <out_dir>

Saves the final params to <out_dir>/params_p<pid>.npz so the test can
assert cross-process identity and equality with the single-process run.
"""

import sys
from pathlib import Path

import jax

# must run before any backend initializes (CLAUDE.md: the sitecustomize
# preloads jax with the axon TPU plugin; env vars are ignored)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main() -> None:
    pid, port, out_dir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8
    assert jax.local_device_count() == 4

    import numpy as np

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from cartseg_tpu.train import TrainConfig, LossSpec, Trainer

    # the tiny classic UNet keeps the CPU-XLA compile cheap enough for
    # two concurrent worker processes on a 1-core host (CLAUDE.md); the
    # multi-process code paths (global mesh, per-host loading, gloo
    # all-reduce, barriers, checkpoint gating) are identical at any size
    cfg = TrainConfig(
        encoder="classic", img_size=(16, 16), batch_size=8, epochs=2,
        lr=1e-3, synthetic=True, synthetic_sessions=2,
        synthetic_per_session=8, seed=0, loss=LossSpec("bce_dice"),
        augment="none", out_dir=out_dir, use_mesh=True)
    tr = Trainer(cfg)
    assert tr.mesh is not None and tr.mesh.devices.size == 8
    res = tr.fit(log=lambda *a: None)

    state = res["state"]
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(state.params):
        flat[jax.tree_util.keystr(path)] = np.asarray(leaf)
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            state.batch_stats):
        flat["STATS" + jax.tree_util.keystr(path)] = np.asarray(leaf)
    np.savez(Path(out_dir) / f"params_p{pid}.npz",
             best_val_dice=np.float64(res["best_val_dice"]), **flat)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
