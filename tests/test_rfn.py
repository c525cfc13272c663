"""End-to-end RFN model tests on a tiny config (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recurrent_flows_tpu.config import GlowConfig, RFNConfig
from recurrent_flows_tpu.flows import data_dependent_init
from recurrent_flows_tpu.models import RFN

B, T, IMG = 2, 4, 16


def tiny_cfg(**kw):
    base = dict(
        x_channels=1,
        image_size=IMG,
        h_dim=8,
        z_dim=2,
        a_dim=4,
        L=2,
        K=2,
        extractor_structure=((4, "pool", 8), (8, "pool", 8)),
        upscaler_structure=((8,), ("upsample", 4)),
        prior_structure=(4,),
        encoder_structure=(4,),
        norm_type="none",
        norm_type_features="none",
        glow=GlowConfig(L=2, K=2, n_units_affine=8, n_units_prior=8),
    )
    base.update(kw)
    return RFNConfig(**base)


def make(cfg):
    model = RFN(cfg, remat=False)
    x = jax.random.uniform(jax.random.key(0), (B, T, IMG, IMG, cfg.x_channels)) - 0.5
    v = model.init(jax.random.key(1), x, jax.random.key(2))
    return model, v, x


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"enable_smoothing": True},
        {"res_q": True},
        {"D": 2},
        {"skip_connection_flow": "without_skip", "skip_connection_features": False},
        {"skip_connection_flow": "only_skip"},
        {"free_bits": 0.5},
    ],
)
def test_rfn_loss_variants(kw):
    cfg = tiny_cfg(**kw)
    model, v, x = make(cfg)
    out = model.apply(v, x, jax.random.key(3), method=RFN.loss)
    for k in ("kl_free_bits", "kl", "nll"):
        assert np.isfinite(float(out[k])), (k, out[k])
    if kw.get("free_bits", -1.0) > 0:
        hu = IMG // 2 ** cfg.L
        assert float(out["kl_free_bits"]) >= 0.5 * hu * hu * cfg.z_dim - 1e-3


def test_rfn_grads_finite():
    cfg = tiny_cfg()
    model, v, x = make(cfg)

    def loss_fn(params):
        out = model.apply(
            {"params": params, "consts": v["consts"]}, x, jax.random.key(3),
            method=RFN.loss,
        )
        return out["nll"] + out["kl_free_bits"]

    g = jax.grad(loss_fn)(v["params"])
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(l)) for l in leaves)
    # something nontrivial flows to the flow and the lstm
    assert any(np.any(np.asarray(l) != 0) for l in jax.tree.leaves(g["flow"]))
    assert any(np.any(np.asarray(l) != 0) for l in jax.tree.leaves(g["lstm"]))


def test_rfn_predict_reconstruct_sample_shapes():
    cfg = tiny_cfg()
    model, v, x = make(cfg)
    true_x, preds = model.apply(
        v, x, 3, 2, jax.random.key(4), method=RFN.predict
    )
    assert true_x.shape == (2, B, IMG, IMG, 1)
    assert preds.shape == (3, B, IMG, IMG, 1)
    recons, recons_flow = model.apply(v, x, jax.random.key(5), method=RFN.reconstruct)
    assert recons.shape == (T - 1, B, IMG, IMG, 1)
    assert recons_flow.shape == (T - 1, B, IMG, IMG, 1)
    # NOTE: recons_flow redraws split z2's from the learned split prior
    # (reference semantics), so it only converges to x as training sharpens
    # the split priors; the exact f∘g bijection is property-tested at flow
    # level (test_flows.test_listglow_bijection).
    assert np.all(np.isfinite(np.asarray(recons_flow)))
    samples = model.apply(v, x, 3, jax.random.key(6), method=RFN.sample)
    assert samples.shape == (3, B, IMG, IMG, 1)


def test_rfn_ddi():
    cfg = tiny_cfg()
    model, v, x = make(cfg)

    def ddi_apply(vars_):
        return model.apply(vars_, x, jax.random.key(0), method=RFN.ddi, mutable=["ddi"])

    v2 = data_dependent_init(v, ddi_apply)
    # actnorm params inside the flow changed
    before = v["params"]["flow"]["scale0_step0"]["norm"]["bias"]
    after = v2["params"]["flow"]["scale0_step0"]["norm"]["bias"]
    assert not np.allclose(before, after)
    # loss still finite with DDI params
    out = model.apply(v2, x, jax.random.key(3), method=RFN.loss)
    assert np.isfinite(float(out["nll"]))


def test_rfn_remat_matches():
    cfg = tiny_cfg()
    model, v, x = make(cfg)
    m2 = RFN(cfg, remat=True)
    out1 = model.apply(v, x, jax.random.key(3), method=RFN.loss)
    out2 = m2.apply(v, x, jax.random.key(3), method=RFN.loss)
    np.testing.assert_allclose(float(out1["nll"]), float(out2["nll"]), rtol=1e-5)


@pytest.mark.slow
def test_batch_flow_loss_matches_scanned_flow():
    """batch_flow=True (time-batched flow) must reproduce the default
    in-scan flow loss bit-for-bit: same math, same RNG consumption."""
    cfg = tiny_cfg()
    x = jax.random.uniform(jax.random.key(0), (B, T, IMG, IMG, 1)) - 0.5
    m0 = RFN(cfg, remat=False)
    m1 = RFN(cfg, remat=False, batch_flow=True)
    v = m0.init(jax.random.key(1), x, jax.random.key(2))
    v = {"params": jax.tree.map(lambda a: a + 0.01, v["params"]),
         "consts": v.get("consts", {})}
    o0 = m0.apply(v, x, jax.random.key(3), method="loss")
    o1 = m1.apply(v, x, jax.random.key(3), method="loss")
    for k in ("nll", "kl", "kl_free_bits"):
        np.testing.assert_allclose(np.asarray(o1[k]), np.asarray(o0[k]),
                                   rtol=1e-5, atol=1e-5)


def test_scan_unroll_equivalence():
    """scan_unroll>1 must be a pure scheduling knob: identical loss and
    identical predictions (same keys) as the default unroll=1."""
    cfg = tiny_cfg()
    model, v, x = make(cfg)
    model4 = RFN(cfg, remat=False, scan_unroll=4)
    out1 = model.apply(v, x, jax.random.key(3), method=RFN.loss)
    out4 = model4.apply(v, x, jax.random.key(3), method=RFN.loss)
    for k in ("nll", "kl", "kl_free_bits"):
        np.testing.assert_allclose(float(out1[k]), float(out4[k]),
                                   rtol=1e-6, err_msg=k)
    _, p1 = model.apply(v, x, 3, 2, jax.random.key(5), method=RFN.predict)
    _, p4 = model4.apply(v, x, 3, 2, jax.random.key(5), method=RFN.predict)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p4),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("policy", ["save_flow_x", "save_flow_full"])
def test_save_flow_remat_policy_equivalence(policy):
    """The selective remat policies are pure memory/schedule knobs: loss
    and per-tensor gradients must match the plain-remat step exactly."""
    cfg = tiny_cfg()
    model, v, x = make(cfg)
    m_plain = RFN(cfg, remat=True, remat_policy=None)  # plain full remat
    m_save = RFN(cfg, remat=True, remat_policy=policy)

    def loss_fn(m):
        def f(params):
            out = m.apply({**v, "params": params}, x, jax.random.key(3),
                          method=RFN.loss)
            return out["nll"] + out["kl_free_bits"]
        return f

    l1, g1 = jax.value_and_grad(loss_fn(m_plain))(v["params"])
    l2, g2 = jax.value_and_grad(loss_fn(m_save))(v["params"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = jax.tree_util.tree_leaves_with_path(g2)
    for (p1, t1), (_, t2) in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(t1), np.asarray(t2), rtol=1e-5, atol=1e-7,
            err_msg=jax.tree_util.keystr(p1))
