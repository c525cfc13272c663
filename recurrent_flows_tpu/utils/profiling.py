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
    """Wall-clock step timing under ASYNC dispatch.

    Two distinct measurements, because a single synced step time is a
    lie on an async backend:

    - ``note_window(n_steps, elapsed_s)``: a sustained-throughput
      window — an epoch's step count over its wall time, where the
      caller synced (bulk ``device_get``) at the window end. This is
      the honest steps/s: enqueue rate and device rate converge over a
      window bounded by syncs.
    - ``start()``/``stop(result)``: a sampled sync (VALUE fetch — on
      the axon remote-TPU backend ``block_until_ready`` is a no-op,
      docs/PERF.md round-3 correction). Under async dispatch this
      drains the ENTIRE enqueued pipeline backlog, so it measures
      drain latency (backlog depth x step time + link RTT), NOT one
      step's cost — reported as ``drain_*``, never inverted into a
      steps/s.
    """

    def __init__(self):
        self.times: List[float] = []  # sampled pipeline-drain latencies
        self.windows: List[tuple] = []  # (n_steps, elapsed_s) sustained
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        """Stop the drain-latency clock; pass a jax array to sync on."""
        if result is not None:
            jax.device_get(result)
        if self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
            self._t0 = None

    def note_window(self, n_steps: int, elapsed_s: float):
        """Record a sustained-throughput window (synced at its end)."""
        if n_steps > 0 and elapsed_s > 0:
            self.windows.append((n_steps, elapsed_s))

    def stats(self) -> dict:
        out: dict = {}
        if self.windows:
            # drop the first window: it contains the jit compile
            w = self.windows[1:] or self.windows
            n = sum(s for s, _ in w)
            t = sum(e for _, e in w)
            out.update(steps_per_s=float(n / t), window_steps=int(n),
                       window_s=float(t), n_windows=len(w))
        if self.times:
            a = np.asarray(self.times[1:] or self.times)  # drop compile
            out.update(
                drain_mean_s=float(a.mean()),
                drain_p50_s=float(np.percentile(a, 50)),
                drain_p95_s=float(np.percentile(a, 95)),
                drain_n=len(a),
            )
        return out


@contextlib.contextmanager
def trace(profile_dir: Optional[str]):
    """jax.profiler trace context; no-op when profile_dir is None."""
    if profile_dir is None:
        yield
        return
    with jax.profiler.trace(profile_dir):
        yield
