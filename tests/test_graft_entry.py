"""dryrun_multichip environment robustness (VERDICT r1 item 1).

The driver may call dryrun_multichip in a process whose default jax
backend is already initialized (and possibly broken — the round-1
failure was eager array creation landing on a libtpu-mismatched axon
backend). The entry must (a) force jax_platforms=cpu +
jax_num_cpu_devices BEFORE backend init when possible, (b) re-exec in
a clean subprocess when a backend is already up with the wrong
platform or too few devices, and never touch the default backend on
that path."""

import os
import subprocess
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_force_cpu_platform_accepts_current_test_env():
    # conftest pinned cpu x8 before backend init; an 8-device request
    # must be satisfiable in-process, a 9-device one must not.
    sys.path.insert(0, str(REPO))
    from __graft_entry__ import _force_cpu_platform
    import jax
    assert jax.default_backend() == "cpu"
    assert _force_cpu_platform(len(jax.devices())) is True
    assert _force_cpu_platform(len(jax.devices()) + 1) is False


def test_dryrun_reexecs_when_backend_already_initialized():
    """Simulates the driver path: a backend is initialized first (here:
    CPU with a single device — same 'initialized and unsuitable' state
    as an axon default), then dryrun_multichip(4) is called. It must
    detect the mismatch, re-exec in a clean subprocess, and pass."""
    code = textwrap.dedent("""
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 1)
        assert len(jax.devices()) == 1  # backend now initialized, 1 dev
        from __graft_entry__ import dryrun_multichip
        dryrun_multichip(4)
        print("REEXEC-PATH-OK")
    """)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # don't leak conftest's 8-device flag
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=str(REPO), env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=1500)
    assert proc.returncode == 0, proc.stdout[-4000:]
    assert "REEXEC-PATH-OK" in proc.stdout
    assert "dryrun_multichip(4): ok" in proc.stdout
