"""Tracing / profiling as first-class (SURVEY §5.1 rebuild requirement).

The reference has no profiling hooks at all; here: a step timer with
percentile stats and a jax.profiler trace context usable around any train
region. Traces open in XProf/TensorBoard.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax
import numpy as np


class StepTimer:
    """Wall-clock step timing with device-sync on sampling boundaries."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        """Stop the clock; pass a jax array to sync on for accurate timing.

        Synced with a VALUE fetch, not block_until_ready — on the axon
        remote-TPU backend block_until_ready is a no-op (docs/PERF.md
        round-3 measurement correction)."""
        if result is not None:
            jax.device_get(result)
        if self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
            self._t0 = None

    def stats(self) -> dict:
        if not self.times:
            return {}
        a = np.asarray(self.times[1:] or self.times)  # drop compile step
        return dict(
            mean_s=float(a.mean()),
            p50_s=float(np.percentile(a, 50)),
            p95_s=float(np.percentile(a, 95)),
            steps_per_s=float(1.0 / a.mean()),
            n=len(a),
        )


@contextlib.contextmanager
def trace(profile_dir: Optional[str]):
    """jax.profiler trace context; no-op when profile_dir is None."""
    if profile_dir is None:
        yield
        return
    with jax.profiler.trace(profile_dir):
        yield
