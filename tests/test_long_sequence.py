"""Long-sequence handling: scan + remat scales to T=30 (the reference's max
eval length) without python unrolling; long rollouts stay finite."""

import jax
import numpy as np

from recurrent_flows_tpu.models import RFN

from test_rfn import tiny_cfg  # noqa: E402


def test_rfn_t30_loss_with_remat():
    cfg = tiny_cfg()
    model = RFN(cfg, remat=True)
    x = jax.random.uniform(jax.random.key(0), (1, 30, 16, 16, 1)) - 0.5
    v = model.init(jax.random.key(1), x[:, :2], jax.random.key(2))
    out = jax.jit(
        lambda v, x, k: model.apply(v, x, k, method="loss")
    )(v, x, jax.random.key(3))
    assert np.isfinite(float(out["nll"]))
    # grads through the 29-step scan
    g = jax.grad(
        lambda p: model.apply({"params": p, "consts": v["consts"]}, x,
                              jax.random.key(3), method="loss")["nll"]
    )(v["params"])
    assert all(np.all(np.isfinite(l)) for l in jax.tree.leaves(g))


def test_rfn_long_rollout_40():
    cfg = tiny_cfg()
    model = RFN(cfg, remat=False)
    x = jax.random.uniform(jax.random.key(0), (1, 4, 16, 16, 1)) - 0.5
    v = model.init(jax.random.key(1), x, jax.random.key(2))
    _, preds = model.apply(v, x, 40, 3, jax.random.key(3), method="predict")
    assert preds.shape[0] == 40
    assert np.all(np.isfinite(np.asarray(preds)))
