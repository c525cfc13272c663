"""Multi-host (pod) initialization scaffolding.

Single-slice multi-chip needs only the in-process mesh (mesh.py). For
multi-host pods, call :func:`initialize` once per process before any jax
op; the mesh helpers then see every chip in the pod via jax.devices().
Data loading uses :func:`process_local_batch_slice` so each host feeds its
own shard of the global batch.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-based autodetection on TPU pods."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def process_local_batch_slice(global_batch: int) -> slice:
    """This host's slice of a globally-indexed batch."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
