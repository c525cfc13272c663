"""SRNN / VRNN model tests on tiny configs (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recurrent_flows_tpu.config import SRNNConfig, VRNNConfig
from recurrent_flows_tpu.models.srnn import SRNN
from recurrent_flows_tpu.models.vrnn import VRNN

B, T, IMG = 2, 4, 16


def make_srnn(**kw):
    base = dict(x_channels=1, image_size=IMG, h_dim=8, z_dim=4, a_dim=8,
                norm_type="none", enable_smoothing=False)
    base.update(kw)
    cfg = SRNNConfig(**base)
    model = SRNN(cfg, remat=False)
    x = jax.random.uniform(jax.random.key(0), (B, T, IMG, IMG, 1))
    v = model.init(jax.random.key(1), x, jax.random.key(2))
    return model, v, x


def make_vrnn(**kw):
    base = dict(x_channels=1, image_size=IMG, h_dim=8, z_dim=4, norm_type="none")
    base.update(kw)
    cfg = VRNNConfig(**base)
    model = VRNN(cfg, remat=False)
    x = jax.random.uniform(jax.random.key(0), (B, T, IMG, IMG, 1))
    v = model.init(jax.random.key(1), x, jax.random.key(2))
    return model, v, x


@pytest.mark.parametrize("loss_type", ["bernoulli", "gaussian", "mse", "mol"])
def test_srnn_loss_types(loss_type):
    pr = "minmax" if loss_type == "mol" else "1.0"
    model, v, x = make_srnn(loss_type=loss_type, preprocess_range=pr)
    if loss_type == "mol":
        x = x * 2 - 1
    out = model.apply(v, x, jax.random.key(3), method="loss")
    assert np.isfinite(float(out["nll"]))
    assert np.isfinite(float(out["kl"]))


@pytest.mark.parametrize("kw", [
    {"enable_smoothing": True}, {"res_q": True}, {"D": 2},
])
def test_srnn_variants(kw):
    model, v, x = make_srnn(**kw)
    out = model.apply(v, x, jax.random.key(3), method="loss")
    assert np.isfinite(float(out["nll"]))


def test_srnn_inference_and_iw():
    model, v, x = make_srnn()
    true_x, preds = model.apply(v, x, 3, 2, jax.random.key(4), method="predict")
    assert preds.shape == (3, B, IMG, IMG, 1)
    recons = model.apply(v, x, jax.random.key(5), method="reconstruct")
    assert recons.shape == (T - 1, B, IMG, IMG, 1)
    samples = model.apply(v, x, 2, jax.random.key(6), method="sample")
    assert samples.shape == (2, B, IMG, IMG, 1)
    iw = model.apply(v, x, 4, jax.random.key(7), method="elbo_importance_weighting")
    assert np.isfinite(float(iw))


def test_vrnn_loss_and_inference():
    model, v, x = make_vrnn()
    out = model.apply(v, x, jax.random.key(3), method="loss")
    assert np.isfinite(float(out["nll"])) and np.isfinite(float(out["kl"]))
    true_x, preds = model.apply(v, x, 3, 2, jax.random.key(4), method="predict")
    assert preds.shape == (3, B, IMG, IMG, 1)
    recons = model.apply(v, x, jax.random.key(5), method="reconstruct")
    assert recons.shape == (T - 1, B, IMG, IMG, 1)
    samples = model.apply(v, x, 2, jax.random.key(6), method="sample")
    assert samples.shape == (2, B, IMG, IMG, 1)
    iw = model.apply(v, x, 4, jax.random.key(7), method="elbo_importance_weighting")
    assert np.isfinite(float(iw))


def test_vrnn_grads():
    model, v, x = make_vrnn()

    def loss_fn(params):
        out = model.apply({"params": params}, x, jax.random.key(3), method="loss")
        return out["nll"] + out["kl_free_bits"]

    g = jax.grad(loss_fn)(v["params"])
    assert all(np.all(np.isfinite(l)) for l in jax.tree.leaves(g))
    assert any(np.any(np.asarray(l) != 0) for l in jax.tree.leaves(g["lstm"]))
