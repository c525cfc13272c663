"""Misc coverage: bf16 compute policy, profiler trace, config round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from recurrent_flows_tpu.config import RFNConfig, TrainConfig, config_from_dict
from recurrent_flows_tpu.models import RFN
from recurrent_flows_tpu.utils.profiling import StepTimer, trace

from test_rfn import tiny_cfg  # noqa: E402


def test_rfn_bf16_compute_policy():
    cfg = tiny_cfg()
    model = RFN(cfg, remat=False, compute_dtype=jnp.bfloat16)
    x = jax.random.uniform(jax.random.key(0), (2, 3, 16, 16, 1)) - 0.5
    v = model.init(jax.random.key(1), x, jax.random.key(2))
    # params stay f32
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(v["params"]))
    out = model.apply(v, x, jax.random.key(3), method="loss")
    assert np.isfinite(float(out["nll"]))
    # flow NLL stays f32
    assert out["nll"].dtype == jnp.float32


def test_profiler_trace_and_timer(tmp_path):
    timer = StepTimer()
    with trace(str(tmp_path)):
        for _ in range(3):
            timer.start()
            y = jnp.sum(jnp.ones((256, 256)) @ jnp.ones((256, 256)))
            timer.stop(y)
    timer.note_window(10, 2.0)  # compile window (dropped by stats)
    timer.note_window(10, 1.0)
    stats = timer.stats()
    assert stats["drain_n"] >= 1 and stats["drain_mean_s"] > 0
    # sustained throughput comes from the post-compile window only
    assert stats["steps_per_s"] == 10.0 and stats["n_windows"] == 1
    # the trace context wrote profiler artifacts
    assert any(os.scandir(tmp_path)), "no profiler output written"


def test_config_round_trip():
    import dataclasses

    cfg = tiny_cfg()
    d = dataclasses.asdict(cfg)
    import json

    d2 = json.loads(json.dumps(d))  # through JSON like the checkpoint meta
    cfg2 = config_from_dict(RFNConfig, d2)
    assert cfg2 == cfg
    t = TrainConfig(batch_size=7)
    t2 = config_from_dict(TrainConfig, json.loads(json.dumps(dataclasses.asdict(t))))
    assert t2 == t
