"""Tracing/profiling — the observability the reference lacks entirely
(SURVEY.md section 5: tqdm bars only). jax.profiler traces gated behind
a config knob plus a lightweight step timer whose stats land in the
metrics CSV/JSON."""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Optional


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]):
    """jax.profiler.trace when a directory is given (viewable in
    TensorBoard / Perfetto); silently no-op if the backend refuses
    (some PJRT transports don't implement profiling)."""
    if not trace_dir:
        yield
        return
    import jax

    Path(trace_dir).mkdir(parents=True, exist_ok=True)
    try:
        with jax.profiler.trace(str(trace_dir)):
            yield
    except Exception:
        yield


class StepTimer:
    """Wall-clock step stats with one sync per window (readback-based —
    block_until_ready is unreliable through relayed PJRT backends)."""

    def __init__(self):
        self.t0 = time.time()
        self.steps = 0
        self.images = 0

    def step(self, batch: int):
        self.steps += 1
        self.images += batch

    def rates(self):
        dt = max(time.time() - self.t0, 1e-9)
        return {"steps_per_sec": self.steps / dt,
                "images_per_sec": self.images / dt,
                "elapsed_s": dt}

    def reset(self):
        self.t0 = time.time()
        self.steps = 0
        self.images = 0
