"""SPMD scaling: device mesh + sharding helpers.

The reference scales with single-node ``nn.DataParallel``
(RFN/trainer.py:92-94) — scatter/gather per step. TPU-native equivalent:
a jax.sharding.Mesh over ICI; the batch is sharded over the 'data' axis,
params are replicated, and jit-of-grad inserts the gradient all-reduce
(psum) automatically. The mesh carries a second 'model' axis so spatial /
tensor sharding can be layered on without changing call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-or-2D mesh ('data', 'model') over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devices = devices[: n_data * n_model]
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, batch):
    """Place a (pytree of) array(s) with batch-axis sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim)), batch
    )


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def spatial_constraint(mesh: Mesh, x):
    """Constrain video batches to (data, -, model, -, -): batch over 'data'
    and frame HEIGHT over 'model' — spatial/sequence parallelism for the
    64x64 activations (SURVEY §2.11 stretch goal). GSPMD inserts the conv
    halo exchanges automatically.
    """
    if mesh.shape.get("model", 1) <= 1 or x.ndim < 4:
        return x
    spec = ["data", None, "model"] + [None] * (x.ndim - 3)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))
