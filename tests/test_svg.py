"""SVG-LP model tests on a tiny config (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recurrent_flows_tpu.config import SVGConfig
from recurrent_flows_tpu.models.svg import SVG

B, T, IMG = 2, 4, 16


def make(**kw):
    base = dict(x_channels=1, image_size=IMG, z_dim=4, c_features=16, h_dim=16,
                norm_type="none")
    base.update(kw)
    cfg = SVGConfig(**base)
    model = SVG(cfg, remat=False)
    x = jax.random.uniform(jax.random.key(0), (B, T, IMG, IMG, 1))
    v = model.init(jax.random.key(1), x, jax.random.key(2))
    return model, v, x


@pytest.mark.parametrize("loss_type", ["bernoulli", "mse", "gaussian"])
def test_svg_loss_types(loss_type):
    model, v, x = make(loss_type=loss_type)
    out = model.apply(v, x, jax.random.key(3), method="loss")
    assert np.isfinite(float(out["nll"])) and np.isfinite(float(out["kl"]))


def test_svg_inference():
    model, v, x = make()
    true_x, preds = model.apply(v, x, 3, 2, jax.random.key(4), method="predict")
    assert preds.shape == (3, B, IMG, IMG, 1)
    recons = model.apply(v, x, jax.random.key(5), method="reconstruct")
    assert recons.shape == (T - 1, B, IMG, IMG, 1)
    samples = model.apply(v, x, 2, jax.random.key(6), method="sample")
    assert samples.shape == (2, B, IMG, IMG, 1)
    iw = model.apply(v, x, 3, jax.random.key(7), method="elbo_importance_weighting")
    assert np.isfinite(float(iw))


def test_svg_grads():
    model, v, x = make()

    def loss_fn(params):
        out = model.apply({"params": params}, x, jax.random.key(3), method="loss")
        return out["nll"] + out["kl_free_bits"]

    g = jax.grad(loss_fn)(v["params"])
    assert all(np.all(np.isfinite(l)) for l in jax.tree.leaves(g))
    for mod in ("encoder", "decoder", "frame_predictor", "posterior", "prior"):
        assert any(np.any(np.asarray(l) != 0) for l in jax.tree.leaves(g[mod])), mod
