"""Checkpoint/resume with the reference's payload contract, via orbax.

Reference RFN/trainer.py:277-315 stores model+optimizer state, annealing /
plot counters, metric histories, and the full config in one file; resuming
restores every counter so beta-annealing and LR schedules continue
correctly. Here: orbax for the device state (params/consts/opt_state/step),
JSON sidecar for host-side counters, histories and config.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Tuple

import jax
import orbax.checkpoint as ocp


def _config_to_json(cfg) -> str:
    def default(o):
        if dataclasses.is_dataclass(o):
            return dataclasses.asdict(o)
        if isinstance(o, tuple):
            return list(o)
        return str(o)

    return json.dumps(dataclasses.asdict(cfg) if dataclasses.is_dataclass(cfg) else cfg,
                      default=default)


def save_checkpoint(path: str, state, meta: Dict[str, Any]) -> None:
    """Save device state (orbax) + host metadata (JSON)."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    state_host = jax.tree.map(lambda x: jax.device_get(x), state)
    ckptr.save(os.path.join(path, "state"), state_host, force=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_checkpoint(path: str, target=None) -> Tuple[Any, Dict[str, Any]]:
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    kwargs = {}
    if target is not None:
        kwargs["item"] = jax.tree.map(lambda x: jax.device_get(x), target)
    state = ckptr.restore(os.path.join(path, "state"), **kwargs)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return state, meta
