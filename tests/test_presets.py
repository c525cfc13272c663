"""Preset configs must construct valid models that initialize and step."""

import jax
import numpy as np
import pytest

from recurrent_flows_tpu import configs
from recurrent_flows_tpu.models import RFN, SRNN, SVG, VRNN


def test_all_presets_construct():
    for name, fn in configs.PRESETS.items():
        model_cfg, train_cfg = fn()
        assert train_cfg.batch_size > 0, name


def test_rfn_production_preset_initializes():
    """The thesis production config must trace/init end to end (tiny batch)."""
    cfg, tcfg = configs.rfn_mnist_production()
    model = RFN(cfg, remat=True)
    x = jax.random.uniform(jax.random.key(0), (1, 2, 64, 64, 1)) - 0.5
    v = model.init(jax.random.key(1), x, jax.random.key(2))
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(v["params"]))
    assert n_params > 1_000_000  # production scale
    nll = model.apply(v, x, jax.random.key(3))
    assert np.all(np.isfinite(np.asarray(nll)))
