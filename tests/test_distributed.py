"""True multi-process jax.distributed: 2 local processes x 4 CPU
devices each (gloo collectives over a local coordinator), one full
Trainer.fit over the global 8-device mesh with per-host batch loading.

Asserts (a) both processes converge to IDENTICAL final params (the
gradient all-reduce keeps replicas in lockstep) and (b) the result
matches the single-process 8-device run to numerical tolerance — the
multi-host path changes only WHERE rows are loaded, never which rows a
global batch contains (parallel/mesh.py host_batch_slice).

The reference is single-process by construction (torch DataLoader +
one GPU, train_bce_dice.py:279-287); this is the SURVEY.md section 2.5
scaling plan actually executing with process_count == 2.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "dist_worker.py"


@pytest.mark.slow
def test_two_process_fit_matches_single_process(tmp_path):
    out = tmp_path / "multi"
    out.mkdir()
    port = 12973

    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(port), str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, cwd=str(REPO))
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for pid, (p, lg) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{lg[-4000:]}"

    a = np.load(out / "params_p0.npz")
    b = np.load(out / "params_p1.npz")
    assert set(a.files) == set(b.files)

    # (a) replicas identical across processes (all-reduce lockstep)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    # (b) equal to the single-process 8-device run (same global batches)
    from cartseg_tpu.train import TrainConfig, LossSpec, Trainer
    cfg = TrainConfig(
        encoder="classic", img_size=(16, 16), batch_size=8, epochs=2,
        lr=1e-3, synthetic=True, synthetic_sessions=2,
        synthetic_per_session=8, seed=0, loss=LossSpec("bce_dice"),
        augment="none", out_dir=str(tmp_path / "single"), use_mesh=True)
    res = Trainer(cfg).fit(log=lambda *a: None)
    state = res["state"]
    import jax

    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(state.params):
        flat[jax.tree_util.keystr(path)] = np.asarray(leaf)
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            state.batch_stats):
        flat["STATS" + jax.tree_util.keystr(path)] = np.asarray(leaf)

    assert set(flat) == set(a.files) - {"best_val_dice"}
    # tolerance: gloo's cross-process all-reduce associates the sum
    # differently from the single-process XLA reduction, and AdamW at
    # early steps is SIGN-sensitive (m/sqrt(v) ~ sign(g) while v ~ 0):
    # an ulp-level difference on a near-zero gradient component flips a
    # whole +-lr step, so per-leaf deviation up to a few * lr is the
    # expected floor (measured 1.98e-3 worst leaf at lr=1e-3 x 2
    # epochs). The EXACT assertions are (a) above and the metric
    # agreement below (val dice observed to agree to 6e-7).
    for k in flat:
        np.testing.assert_allclose(a[k], flat[k], atol=5e-3, rtol=5e-3,
                                    err_msg=k)
    assert abs(float(a["best_val_dice"]) - res["best_val_dice"]) < 1e-4
