"""Tracing / profiling helpers (SURVEY.md section 5).

The reference's only instrumentation is ad-hoc ``time.perf_counter`` brackets
(reference test/test_time_admm.py:90-93, train.py:159,287).  Here:

- ``trace(logdir)``: context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable device trace;
- ``StepTimer``: wall-clock step timing with correct completion barriers
  (scalar host fetch -- block_until_ready is unreliable on the tunnel
  backend) and throughput accounting;
- ``timed_fetch``: time a single jitted call to completion.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace into ``logdir``."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def fetch_scalar(x) -> float:
    """Completion barrier: force a host fetch of a scalar-reducible value."""
    import jax.numpy as jnp

    import jax

    if hasattr(x, "dtype") and jnp.iscomplexobj(x):
        x = jax.jit(lambda v: jnp.sum(jnp.abs(v)))(x)
    elif hasattr(x, "shape") and getattr(x, "shape", ()) != ():
        x = jax.jit(lambda v: jnp.sum(v))(x)
    return float(x)


def timed_fetch(fn, *args) -> tuple:
    """(result, seconds): runs fn(*args) and barriers via a scalar fetch."""
    t0 = time.perf_counter()
    out = fn(*args)
    leaves = [out] if not isinstance(out, (tuple, list)) else list(out)
    fetch_scalar(leaves[0])
    return out, time.perf_counter() - t0


class StepTimer:
    """Accumulate per-step wall times; report mean/percentiles/throughput."""

    def __init__(self, items_per_step: int = 1):
        self.items_per_step = items_per_step
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        assert self._t0 is not None, "start() not called"
        self.times.append(time.perf_counter() - self._t0)
        self._t0 = None

    @contextlib.contextmanager
    def step(self):
        self.start()
        yield
        self.stop()

    def summary(self) -> Dict[str, float]:
        import numpy as np

        t = np.asarray(self.times)
        if t.size == 0:
            return {}
        return {
            "steps": int(t.size),
            "mean_s": float(t.mean()),
            "p50_s": float(np.median(t)),
            "p95_s": float(np.percentile(t, 95)),
            "items_per_s": float(self.items_per_step / t.mean()),
        }
