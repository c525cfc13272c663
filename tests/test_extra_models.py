"""Tests: 2-D flows, standalone Glow image models, VRNN-1D, shape/sinusoid/
two-moons generators."""

import jax
import jax.numpy as jnp
import numpy as np

from recurrent_flows_tpu.config import GlowConfig
from recurrent_flows_tpu.data import (
    RotatingTwoMoonsConditionalSampler,
    SinusWithNoise,
    MovingShapes,
    get_joint_conditioned_data,
)
from recurrent_flows_tpu.flows.realnvp2d import AutoregFlow2D, MixtureCDFFlow, RealNVP2D
from recurrent_flows_tpu.models.glow_image import ConditionalGlowImage, GlowImage
from recurrent_flows_tpu.models.vrnn1d import VRNN1D


def test_realnvp2d_bijection_and_training_signal():
    m = RealNVP2D(n_couplings=4, hidden=16)
    x = jax.random.normal(jax.random.key(0), (8, 2))
    v = m.init(jax.random.key(1), x)
    v = jax.tree.map(lambda a: a + 0.05, v)
    z, ld = m.apply(v, x, method="f")
    x2 = m.apply(v, z, method="g")
    np.testing.assert_allclose(np.asarray(x), np.asarray(x2), atol=1e-5)
    lp = m.apply(v, x)
    assert lp.shape == (8,) and np.all(np.isfinite(np.asarray(lp)))
    g = jax.grad(lambda p: -jnp.mean(m.apply(p, x)))(v)
    assert all(np.all(np.isfinite(l)) for l in jax.tree.leaves(g))


def test_conditional_realnvp2d():
    m = RealNVP2D(n_couplings=4, hidden=16, context_dim=1)
    sampler = RotatingTwoMoonsConditionalSampler()
    x, theta = sampler.joint_sample(jax.random.key(0), 8)
    ctx = jnp.full((8, 1), theta)
    v = m.init(jax.random.key(1), x, ctx)
    lp = m.apply(v, x, ctx)
    assert np.all(np.isfinite(np.asarray(lp)))
    s = m.apply(v, jax.random.key(2), 8, ctx, method="sample")
    assert s.shape == (8, 2)


def test_mixture_cdf_and_autoreg():
    m = MixtureCDFFlow(n_components=3)
    x = jax.random.normal(jax.random.key(0), (16,))
    v = m.init(jax.random.key(1), x)
    z, lp = m.apply(v, x)
    assert np.all((np.asarray(z) >= 0) & (np.asarray(z) <= 1))
    x2, _ = m.apply(v, z, reverse=True)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x2), atol=1e-4)
    a = AutoregFlow2D(n_components=3, hidden=8)
    x2d = jax.random.normal(jax.random.key(2), (8, 2))
    va = a.init(jax.random.key(3), x2d)
    lp2 = a.apply(va, x2d)
    assert np.all(np.isfinite(np.asarray(lp2)))


def test_glow_image_and_conditional():
    cfg = GlowConfig(L=2, K=2, n_units_affine=8, n_units_prior=8)
    m = GlowImage(1, 16, cfg, cond_channels=4, base_channels=4)
    x = jax.random.uniform(jax.random.key(0), (2, 16, 16, 1)) - 0.5
    v = m.init(jax.random.key(1), x, jax.random.key(2))
    out = m.apply(v, x, jax.random.key(3), method="loss")
    assert np.isfinite(float(out["nll"]))
    s = m.apply(v, 2, jax.random.key(4), method="sample")
    assert s.shape == (2, 16, 16, 1)

    cm = ConditionalGlowImage(3, 16, cfg, cond_channels=8)
    imgs = jax.random.uniform(jax.random.key(5), (2, 16, 16, 3))
    ctx, target = get_joint_conditioned_data(np.asarray(imgs), box=8)
    cv = cm.init(jax.random.key(6), imgs, jnp.asarray(ctx), jax.random.key(7))
    nll = cm.apply(cv, imgs, jnp.asarray(ctx), jax.random.key(8))
    assert nll.shape == (2,) and np.all(np.isfinite(np.asarray(nll)))
    s = cm.apply(cv, jnp.asarray(ctx), jax.random.key(9), method="sample")
    assert s.shape == (2, 16, 16, 3)


def test_vrnn1d_on_sinusoids():
    ds = SinusWithNoise(seq_len=12)
    x = ds.sample(jax.random.key(0), 4)
    assert x.shape == (4, 12, 1)
    m = VRNN1D(h_dim=16, z_dim=4, feat_dim=8)
    v = m.init(jax.random.key(1), x, jax.random.key(2))
    out = m.apply(v, x, jax.random.key(3), method="loss")
    assert np.isfinite(float(out["nll"])) and np.isfinite(float(out["kl"]))
    true_x, preds = m.apply(v, x, 5, 4, jax.random.key(4), method="predict")
    assert preds.shape == (5, 4, 1)
    # training reduces loss on this trivial task
    import optax

    opt = optax.adam(3e-3)
    params = v["params"]
    ost = opt.init(params)

    def lfn(p, key):
        out = m.apply({"params": p}, ds.sample(key, 16), jax.random.fold_in(key, 1),
                      method="loss")
        return out["nll"] + out["kl_free_bits"]

    @jax.jit
    def step(p, o, key):
        l, g = jax.value_and_grad(lfn)(p, key)
        u, o = opt.update(g, o)
        return optax.apply_updates(p, u), o, l

    l0 = None
    for i in range(30):
        params, ost, l = step(params, ost, jax.random.key(10 + i))
        l0 = l if l0 is None else l0
    assert float(l) < float(l0)


def test_moving_shapes():
    ds = MovingShapes(seq_len=5, image_size=32)
    x = ds.sample(jax.random.key(0), 3)
    assert x.shape == (3, 5, 32, 32, 1)
    assert float(jnp.max(x)) == 1.0
    assert float(jnp.abs(x[:, 1] - x[:, 0]).sum()) > 0
