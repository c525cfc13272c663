"""Property tests for every bijection: forward∘inverse ≈ id and logdet ≈
slogdet(jacobian) on small shapes — the formalization of the reference's
per-epoch "Recon-Bijection" check (RFN/RFN_new.py:437-439, SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recurrent_flows_tpu.config import GlowConfig
from recurrent_flows_tpu.flows import (
    ActNorm,
    AffineCoupling,
    GlowStep,
    InvConv,
    ListGlow,
    Split2d,
    data_dependent_init,
)
from recurrent_flows_tpu.utils import squeeze2d, unsqueeze2d

B, H, W, C = 2, 4, 4, 4
COND_C = 3


def _jac_logdet(fn, x):
    """slogdet of the jacobian of flattened fn at x (single sample)."""
    flat_fn = lambda xf: fn(xf.reshape(x.shape)).reshape(-1)
    jac = jax.jacfwd(flat_fn)(x.reshape(-1))
    return jnp.linalg.slogdet(jac)[1]


def test_actnorm_roundtrip_and_logdet():
    m = ActNorm(C)
    x = jax.random.normal(jax.random.key(0), (B, H, W, C))
    v = m.init(jax.random.key(1), x, jnp.zeros(B))
    # make it non-trivial
    v = jax.tree.map(lambda a: a + 0.3, v)
    y, ld = m.apply(v, x, jnp.zeros(B))
    x2, ld2 = m.apply(v, y, ld, reverse=True)
    np.testing.assert_allclose(x, x2, atol=1e-5)
    np.testing.assert_allclose(ld2, 0.0, atol=1e-4)
    # logdet vs jacobian (per-sample)
    fn = lambda xi: m.apply(v, xi[None], None)[0][0]
    jld = _jac_logdet(fn, x[0])
    np.testing.assert_allclose(ld[0], jld, rtol=1e-4)


@pytest.mark.parametrize("lu", [True, False])
def test_invconv_roundtrip_and_logdet(lu):
    m = InvConv(C, lu_decomposed=lu)
    x = jax.random.normal(jax.random.key(0), (B, H, W, C))
    v = m.init(jax.random.key(1), x, jnp.zeros(B))
    # perturb the trainable factors so the weight isn't orthogonal anymore
    v = dict(v)
    v["params"] = jax.tree.map(lambda a: a + 0.05, v["params"])
    y, ld = m.apply(v, x, jnp.zeros(B))
    x2, ld2 = m.apply(v, y, ld, reverse=True)
    np.testing.assert_allclose(x, x2, atol=1e-5)
    np.testing.assert_allclose(ld2, 0.0, atol=1e-3)
    fn = lambda xi: m.apply(v, xi[None], None)[0][0]
    jld = _jac_logdet(fn, x[0])
    np.testing.assert_allclose(ld[0], jld, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("clamp", ["glow", "softclamp", "realnvp", "none"])
def test_affine_coupling_roundtrip_and_logdet(clamp):
    m = AffineCoupling(C, hidden_units=8, clamp_type=clamp)
    x = jax.random.normal(jax.random.key(0), (B, H, W, C))
    cond = jax.random.normal(jax.random.key(2), (B, H, W, COND_C))
    v = m.init(jax.random.key(1), x, cond, jnp.zeros(B))
    # zero-init conv makes it identity; perturb params to exercise the math
    v = {"params": jax.tree.map(lambda a: a + 0.1 * jnp.ones_like(a), v["params"])}
    y, ld = m.apply(v, x, cond, jnp.zeros(B))
    x2, ld2 = m.apply(v, y, cond, ld, reverse=True)
    np.testing.assert_allclose(x, x2, atol=1e-5)
    np.testing.assert_allclose(ld2, 0.0, atol=1e-3)
    fn = lambda xi: m.apply(v, xi[None], jnp.repeat(cond[:1], 1, 0), None)[0][0]
    jld = _jac_logdet(fn, x[0])
    np.testing.assert_allclose(ld[0], jld, rtol=1e-3)


def test_squeeze_is_inverse_and_matches_reference_order():
    x = jnp.arange(B * H * W * C, dtype=jnp.float32).reshape(B, H, W, C)
    y = squeeze2d(x)
    assert y.shape == (B, H // 2, W // 2, 4 * C)
    np.testing.assert_allclose(unsqueeze2d(y), x)
    # channel order = (c, h-offset, w-offset), c slowest (torch permute order)
    np.testing.assert_allclose(y[0, 0, 0, 0], x[0, 0, 0, 0])
    np.testing.assert_allclose(y[0, 0, 0, 1], x[0, 0, 1, 0])  # w-offset fastest
    np.testing.assert_allclose(y[0, 0, 0, 2], x[0, 1, 0, 0])  # then h-offset
    np.testing.assert_allclose(y[0, 0, 0, 4], x[0, 0, 0, 1])  # then channel


def test_glowstep_roundtrip():
    cfg = GlowConfig(L=1, K=1, n_units_affine=8)
    m = GlowStep(C, cfg)
    x = jax.random.normal(jax.random.key(0), (B, H, W, C))
    cond = jax.random.normal(jax.random.key(2), (B, H, W, COND_C))
    v = m.init(jax.random.key(1), x, cond, jnp.zeros(B))
    y, ld = m.apply(v, x, cond, jnp.zeros(B))
    x2, ld2 = m.apply(v, y, cond, ld, reverse=True)
    np.testing.assert_allclose(x, x2, atol=1e-5)
    np.testing.assert_allclose(ld2, 0.0, atol=1e-3)


def test_split2d_forward_reverse_consistency():
    m = Split2d(C, make_conditional=True)
    x = jax.random.normal(jax.random.key(0), (B, H, W, C))
    cond = jax.random.normal(jax.random.key(2), (B, H, W, COND_C))
    v = m.init(jax.random.key(1), x, cond, jnp.zeros(B))
    z1, ld = m.apply(v, x, cond, jnp.zeros(B))
    assert z1.shape == (B, H, W, C // 2)
    assert jnp.all(jnp.isfinite(ld))
    # reverse with temperature 0 -> z2 = mean (deterministic)
    xr, _ = m.apply(v, z1, cond, None, reverse=True, rng=jax.random.key(3), temperature=0.0)
    assert xr.shape == x.shape
    np.testing.assert_allclose(xr[..., : C // 2], z1, atol=1e-6)


def _make_listglow(L=2, K=2, img=8, c_in=4):
    cfg = GlowConfig(L=L, K=K, n_units_affine=8, n_units_prior=8, n_bits=8)
    m = ListGlow(c_in, img, cfg)
    x = jax.random.normal(jax.random.key(0), (B, img, img, c_in)) * 0.1
    conds = [
        jax.random.normal(jax.random.key(10 + l), (B, img // 2 ** (l + 1), img // 2 ** (l + 1), COND_C))
        for l in range(L)
    ]
    base = jax.random.normal(jax.random.key(20), (B, img // 2 ** L, img // 2 ** L, 5))
    v = m.init(jax.random.key(1), x, conds, base, jax.random.key(2))
    return m, v, x, conds, base


def test_listglow_bijection():
    m, v, x, conds, base = _make_listglow()
    z, nll = m.apply(v, x, conds, base, method="f", logdet=jnp.zeros(B)) if False else (None, None)
    # f then g with the same z must reproduce x (temperature irrelevant for
    # the retained z1 path; split z2 redrawn => compare through f again)
    z, ld = m.apply(v, x, conds, jnp.zeros(B), method=ListGlow.f)
    x2 = m.apply(v, z, conds, jax.random.key(3), method=ListGlow.g)
    # g redraws split z2's, so check f(g(z)) == z instead of g(f(x)) == x
    z2, _ = m.apply(v, x2, conds, jnp.zeros(B), method=ListGlow.f)
    np.testing.assert_allclose(z, z2, atol=2e-4)


def test_listglow_logprob_and_sample():
    m, v, x, conds, base = _make_listglow()
    z, nll = m.apply(v, x, conds, base, jax.random.key(5), method=ListGlow.log_prob)
    assert nll.shape == (B,)
    assert jnp.all(jnp.isfinite(nll))
    s = m.apply(v, None, conds, base, jax.random.key(6), method=ListGlow.sample, temperature=0.7)
    assert s.shape == x.shape
    # round-trip through provided z reproduces the deterministic z1 path
    s2 = m.apply(v, z, conds, base, jax.random.key(7), method=ListGlow.sample)
    z3, _ = m.apply(v, s2, conds, jnp.zeros(B), method=ListGlow.f)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z3), atol=2e-4)


def test_listglow_ddi_normalizes_first_actnorm():
    m, v, x, conds, base = _make_listglow()
    # shift input so pre-actnorm stats are clearly non-normalized
    x_shifted = x * 3.0 + 1.0

    def ddi_apply(vars_):
        return m.apply(
            vars_, x_shifted, conds, base, jax.random.key(0),
            method=ListGlow.log_prob, dequantize=False, ddi=True,
            mutable=["ddi"],
        )

    v2 = data_dependent_init(v, ddi_apply)
    # the very first actnorm (scale0_step0) must normalize its input:
    y = squeeze2d(x_shifted)
    p = v2["params"]["scale0_step0"]["norm"]
    out = (y + p["bias"]) * jnp.exp(p["logs"])
    np.testing.assert_allclose(jnp.mean(out, axis=(0, 1, 2)), 0.0, atol=1e-4)
    np.testing.assert_allclose(jnp.std(out, axis=(0, 1, 2), ddof=1), 1.0, atol=1e-2)
    # and params actually changed
    assert not np.allclose(p["bias"], v["params"]["scale0_step0"]["norm"]["bias"])


def test_listglow_coupling_dtype_bf16():
    """coupling_dtype='bfloat16': the coupling NN computes in bf16 but the
    bijection stays exactly invertible (the bf16 net is deterministic) and
    all params remain f32 (GlowConfig.coupling_dtype)."""
    cfg = GlowConfig(L=2, K=2, n_units_affine=8, n_units_prior=8, n_bits=8,
                     coupling_dtype="bfloat16")
    m = ListGlow(4, 8, cfg)
    x = jax.random.normal(jax.random.key(0), (B, 8, 8, 4)) * 0.1
    conds = [
        jax.random.normal(jax.random.key(10 + l),
                          (B, 8 // 2 ** (l + 1), 8 // 2 ** (l + 1), COND_C))
        for l in range(2)
    ]
    base = jax.random.normal(jax.random.key(20), (B, 2, 2, 5))
    v = m.init(jax.random.key(1), x, conds, base, jax.random.key(2))
    # every param stays f32 (bf16 is compute-only)
    for leaf in jax.tree_util.tree_leaves(v["params"]):
        assert leaf.dtype == jnp.float32
    z, ld = m.apply(v, x, conds, jnp.zeros(B), method=ListGlow.f)
    assert z.dtype == jnp.float32 and jnp.all(jnp.isfinite(ld))
    x2 = m.apply(v, z, conds, jax.random.key(3), method=ListGlow.g)
    z2, _ = m.apply(v, x2, conds, jnp.zeros(B), method=ListGlow.f)
    # exact-inverse property is dtype-independent; tolerance covers the
    # f->g->f roundtrip arithmetic only
    np.testing.assert_allclose(z, z2, atol=2e-3)
    _, nll = m.apply(v, x, conds, base, jax.random.key(5),
                     method=ListGlow.log_prob)
    assert jnp.all(jnp.isfinite(nll))


def test_conv2dnorm_fold_actnorm_equivalence():
    """fold_actnorm=True computes the same function as the unfolded
    conv->actnorm path (exact up to float reassociation) with an
    identical param tree."""
    from recurrent_flows_tpu.flows.modules import Conv2dNorm

    x = jax.random.normal(jax.random.key(0), (3, 6, 6, 5))
    folded = Conv2dNorm(8, 3, norm="actnorm", fold_actnorm=True)
    plain = Conv2dNorm(8, 3, norm="actnorm", fold_actnorm=False)
    v = folded.init(jax.random.key(1), x)
    # same tree either way (checkpoint compatibility)
    v2 = plain.init(jax.random.key(1), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    # randomize actnorm params so the fold actually has something to fold
    p = jax.tree_util.tree_map(lambda a: a, v["params"])
    p["actnorm"]["logs"] = jax.random.normal(jax.random.key(2), (8,)) * 0.3
    p["actnorm"]["bias"] = jax.random.normal(jax.random.key(3), (8,)) * 0.5
    y_fold = folded.apply({"params": p}, x)
    y_plain = plain.apply({"params": p}, x)
    np.testing.assert_allclose(y_fold, y_plain, atol=1e-5, rtol=1e-5)


def test_conv2dzeros_fold_gain_equivalence():
    """fold_gain=True: conv_{W·g}(x)+b·g == (conv_W(x)+b)·e^{3·logs},
    exact up to float reassociation, identical param tree."""
    from recurrent_flows_tpu.flows.modules import Conv2dZeros

    x = jax.random.normal(jax.random.key(0), (3, 6, 6, 5))
    folded = Conv2dZeros(8, 3, fold_gain=True)
    plain = Conv2dZeros(8, 3, fold_gain=False)
    v = folded.init(jax.random.key(1), x)
    v2 = plain.init(jax.random.key(1), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    # zeros-init conv outputs 0 regardless — randomize everything
    p = dict(v["params"])
    p["conv"] = dict(kernel=jax.random.normal(jax.random.key(2), (3, 3, 5, 8)) * 0.1,
                     bias=jax.random.normal(jax.random.key(3), (8,)) * 0.2)
    p["logs"] = jax.random.normal(jax.random.key(4), (8,)) * 0.3
    y_fold = folded.apply({"params": p}, x)
    y_plain = plain.apply({"params": p}, x)
    np.testing.assert_allclose(y_fold, y_plain, atol=1e-5, rtol=1e-5)


def test_invconv_actnorm_fold_equivalence():
    """InvConv(fold_bias/fold_logs) == ActNorm then InvConv, including the
    combined logdet, for both LU and dense parameterizations."""
    from recurrent_flows_tpu.flows.modules import ActNorm, InvConv

    x = jax.random.normal(jax.random.key(0), (4, 5, 5, 6))
    bias = jax.random.normal(jax.random.key(1), (6,)) * 0.5
    logs = jax.random.normal(jax.random.key(2), (6,)) * 0.3
    for lu in (True, False):
        inv = InvConv(6, lu_decomposed=lu)
        v = inv.init(jax.random.key(3), x)
        an = ActNorm(6)
        va = {"params": {"bias": bias, "logs": logs}}
        y_ref, ld_ref = an.apply(va, x, jnp.zeros(4))
        y_ref, ld_ref = inv.apply(v, y_ref, ld_ref)
        y_fold, ld_fold = inv.apply(v, x, jnp.zeros(4),
                                    fold_bias=bias, fold_logs=logs)
        np.testing.assert_allclose(y_fold, y_ref, atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(ld_fold, ld_ref, atol=1e-3, rtol=1e-5)


def test_glowstep_forward_fold_matches_reverse_inverse():
    """With the forward-path folds active, GlowStep forward followed by
    the (unfolded) reverse path is still the exact identity, and the
    forward logdet matches the reverse logdet."""
    from recurrent_flows_tpu.flows.glow import GlowStep

    cfg = GlowConfig(L=1, K=1, n_units_affine=32)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    cond = jax.random.normal(jax.random.key(1), (2, 8, 8, 3))
    step = GlowStep(4, cfg)
    v = step.init(jax.random.key(2), x, cond, jnp.zeros(2))
    # randomize norm params so the fold is non-trivial
    p = dict(v["params"])
    p["norm"] = dict(bias=jax.random.normal(jax.random.key(3), (4,)) * 0.4,
                     logs=jax.random.normal(jax.random.key(4), (4,)) * 0.3)
    var = {"params": p, **{k: v[k] for k in v if k != "params"}}
    y, ld = step.apply(var, x, cond, jnp.zeros(2))
    x2, ld2 = step.apply(var, y, cond, ld, reverse=True)
    np.testing.assert_allclose(x2, x, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(ld2, jnp.zeros(2), atol=1e-3)


def test_invconv_actnorm_fold_reverse_equivalence():
    """Reverse fold: InvConv(reverse, fold) == InvConv(reverse) then
    ActNorm(reverse), including logdets, for both parameterizations."""
    from recurrent_flows_tpu.flows.modules import ActNorm, InvConv

    y = jax.random.normal(jax.random.key(0), (4, 5, 5, 6))
    bias = jax.random.normal(jax.random.key(1), (6,)) * 0.5
    logs = jax.random.normal(jax.random.key(2), (6,)) * 0.3
    for lu in (True, False):
        inv = InvConv(6, lu_decomposed=lu)
        v = inv.init(jax.random.key(3), y)
        an = ActNorm(6)
        va = {"params": {"bias": bias, "logs": logs}}
        x_ref, ld_ref = inv.apply(v, y, jnp.zeros(4), reverse=True)
        x_ref, ld_ref = an.apply(va, x_ref, ld_ref, reverse=True)
        x_fold, ld_fold = inv.apply(v, y, jnp.zeros(4), reverse=True,
                                    fold_bias=bias, fold_logs=logs)
        np.testing.assert_allclose(x_fold, x_ref, atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(ld_fold, ld_ref, atol=1e-3, rtol=1e-5)


def test_listglow_fold_weights_knob_equivalence():
    """GlowConfig.fold_weights=False (A/B escape hatch) computes the same
    f/log_prob as the default folded path, same param tree."""
    from recurrent_flows_tpu.flows.glow import ListGlow

    B, H, C = 2, 8, 4
    x = jax.random.normal(jax.random.key(0), (B, H, H, C)) * 0.1
    out = {}
    for fold in (True, False):
        cfg = GlowConfig(L=2, K=2, n_units_affine=8, n_units_prior=8,
                         fold_weights=fold)
        m = ListGlow(C, H, cfg)
        conds_l = [
            jax.random.normal(jax.random.key(10 + l),
                              (B, H // 2 ** (l + 1), H // 2 ** (l + 1), 3))
            for l in range(cfg.L)
        ]
        base_c = jax.random.normal(jax.random.key(20),
                                   (B, H // 2 ** cfg.L, H // 2 ** cfg.L, 5))
        v = m.init(jax.random.key(1), x, conds_l, base_c, jax.random.key(2))
        # randomize the 1-d (norm/bias/logs) params so folds are non-trivial
        p = jax.tree_util.tree_map(
            lambda a: a + 0.1 * jax.random.normal(jax.random.key(3), a.shape)
            if a.ndim == 1 else a, v["params"])
        var = {"params": p, **{k: v[k] for k in v if k != "params"}}
        z, ld = m.apply(var, x, conds_l, jnp.zeros(B), method=ListGlow.f)
        out[fold] = (z, ld, jax.tree_util.tree_structure(v))
    np.testing.assert_allclose(out[True][0], out[False][0], atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(out[True][1], out[False][1], atol=2e-3, rtol=1e-5)
    assert out[True][2] == out[False][2]


@pytest.mark.parametrize("mode", ["sublane", "lanes"])
def test_listglow_packed_layout_equivalence(mode):
    """GlowConfig.packed_layout ('sublane' [B,C,S] / 'lanes' [B,H,C*W]
    x-stream through each scale's GlowSteps) computes the same f/ld/g as
    the NHWC default — identical math, different physical tiling — with
    the same param tree, and g round-trips through f."""
    from recurrent_flows_tpu.flows.glow import ListGlow

    B, H, C = 2, 8, 4
    x = jax.random.normal(jax.random.key(0), (B, H, H, C)) * 0.1
    out = {}
    for packed in (False, mode):
        cfg = GlowConfig(L=2, K=2, n_units_affine=8, n_units_prior=8,
                         packed_layout=packed)
        m = ListGlow(C, H, cfg)
        conds_l = [
            jax.random.normal(jax.random.key(10 + l),
                              (B, H // 2 ** (l + 1), H // 2 ** (l + 1), 3))
            for l in range(cfg.L)
        ]
        base_c = jax.random.normal(jax.random.key(20),
                                   (B, H // 2 ** cfg.L, H // 2 ** cfg.L, 5))
        v = m.init(jax.random.key(1), x, conds_l, base_c, jax.random.key(2))
        p = jax.tree_util.tree_map(
            lambda a: a + 0.1 * jax.random.normal(jax.random.key(3), a.shape)
            if a.ndim == 1 else a, v["params"])
        var = {"params": p, **{k: v[k] for k in v if k != "params"}}
        z, ld = m.apply(var, x, conds_l, jnp.zeros(B), method=ListGlow.f)
        xg = m.apply(var, z, conds_l, jax.random.key(4), method=ListGlow.g)
        zr, _ = m.apply(var, xg, conds_l, jnp.zeros(B), method=ListGlow.f)
        out[packed] = (z, ld, xg, zr, jax.tree_util.tree_structure(v))
    np.testing.assert_allclose(out[mode][0], out[False][0], atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(out[mode][1], out[False][1], atol=2e-3, rtol=1e-5)
    # same rng stream -> identical g samples across layouts
    np.testing.assert_allclose(out[mode][2], out[False][2], atol=3e-5, rtol=3e-5)
    # packed g round-trips through packed f
    np.testing.assert_allclose(out[mode][3], out[mode][0], atol=2e-4)
    assert out[mode][4] == out[False][4]


@pytest.mark.parametrize("mode", ["sublane", "lanes"])
def test_packed_layout_gradients_match(mode):
    """loss+grad through the packed layout == the NHWC default."""
    from recurrent_flows_tpu.flows.glow import ListGlow

    B, H, C = 2, 8, 4
    x = jax.random.normal(jax.random.key(0), (B, H, H, C)) * 0.1
    grads, vals = {}, {}
    for packed in (False, mode):
        cfg = GlowConfig(L=2, K=2, n_units_affine=8, n_units_prior=8,
                         packed_layout=packed)
        m = ListGlow(C, H, cfg)
        conds_l = [
            jax.random.normal(jax.random.key(10 + l),
                              (B, H // 2 ** (l + 1), H // 2 ** (l + 1), 3))
            for l in range(cfg.L)
        ]
        base_c = jax.random.normal(jax.random.key(20),
                                   (B, H // 2 ** cfg.L, H // 2 ** cfg.L, 5))
        v = m.init(jax.random.key(1), x, conds_l, base_c, jax.random.key(2))

        def loss(p):
            _, nll = m.apply({"params": p, **{k: v[k] for k in v if k != "params"}},
                             x, conds_l, base_c, jax.random.key(5),
                             method=ListGlow.log_prob)
            return jnp.mean(nll)

        vals[packed], grads[packed] = jax.value_and_grad(loss)(v["params"])
    np.testing.assert_allclose(vals[mode], vals[False], rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3),
        grads[mode], grads[False])


@pytest.mark.parametrize("mode", ["sample", "all"])
def test_listglow_chain_impl_equivalence(mode):
    """GlowConfig.chain_impl routes each small-spatial scale's whole
    K-step GlowStep chain through ONE pallas_call (glowchain kernel,
    interpret mode on CPU); f/logdet/g must match the module path with
    the same param tree. chain_impl='sample' engages on g only,
    'all' on f too."""
    from recurrent_flows_tpu.flows.glow import ListGlow

    B, H, C = 2, 8, 4
    x = jax.random.normal(jax.random.key(0), (B, H, H, C)) * 0.1
    out = {}
    for chain in ("off", mode):
        cfg = GlowConfig(L=2, K=2, n_units_affine=8, n_units_prior=8,
                         chain_impl=chain)
        m = ListGlow(C, H, cfg)
        conds_l = [
            jax.random.normal(jax.random.key(10 + l),
                              (B, H // 2 ** (l + 1), H // 2 ** (l + 1), 3))
            for l in range(cfg.L)
        ]
        base_c = jax.random.normal(jax.random.key(20),
                                   (B, H // 2 ** cfg.L, H // 2 ** cfg.L, 5))
        v = m.init(jax.random.key(1), x, conds_l, base_c, jax.random.key(2))
        p = jax.tree_util.tree_map(
            lambda a: a + 0.1 * jax.random.normal(jax.random.key(3), a.shape)
            if a.ndim == 1 else a, v["params"])
        var = {"params": p, **{k: v[k] for k in v if k != "params"}}
        z, ld = m.apply(var, x, conds_l, jnp.zeros(B), method=ListGlow.f)
        xg = m.apply(var, z, conds_l, jax.random.key(4), method=ListGlow.g)
        out[chain] = (z, ld, xg, jax.tree_util.tree_structure(v))
    np.testing.assert_allclose(out[mode][0], out["off"][0], atol=3e-5,
                               rtol=3e-5)
    np.testing.assert_allclose(out[mode][1], out["off"][1], atol=2e-3,
                               rtol=1e-5)
    # same rng stream -> identical g samples across implementations
    np.testing.assert_allclose(out[mode][2], out["off"][2], atol=3e-5,
                               rtol=3e-5)
    assert out[mode][3] == out["off"][3]


def test_chain_impl_gradients_match():
    """loss+grad with chain_impl='all' (pallas fwd, jnp-remat VJP) == the
    module path."""
    from recurrent_flows_tpu.flows.glow import ListGlow

    B, H, C = 2, 8, 4
    x = jax.random.normal(jax.random.key(0), (B, H, H, C)) * 0.1
    grads, vals = {}, {}
    for chain in ("off", "all"):
        cfg = GlowConfig(L=2, K=2, n_units_affine=8, n_units_prior=8,
                         chain_impl=chain)
        m = ListGlow(C, H, cfg)
        conds_l = [
            jax.random.normal(jax.random.key(10 + l),
                              (B, H // 2 ** (l + 1), H // 2 ** (l + 1), 3))
            for l in range(cfg.L)
        ]
        base_c = jax.random.normal(jax.random.key(20),
                                   (B, H // 2 ** cfg.L, H // 2 ** cfg.L, 5))
        v = m.init(jax.random.key(1), x, conds_l, base_c, jax.random.key(2))

        def loss(p):
            _, nll = m.apply({"params": p, **{k: v[k] for k in v if k != "params"}},
                             x, conds_l, base_c, jax.random.key(5),
                             method=ListGlow.log_prob)
            return jnp.mean(nll)

        vals[chain], grads[chain] = jax.value_and_grad(loss)(v["params"])
    np.testing.assert_allclose(vals["all"], vals["off"], rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3),
        grads["all"], grads["off"])


# -- dual-stream scale executor (GlowConfig.dual_stream) -------------------


def _dual_setup(clamp="realnvp", lu=True, L=2, K=2, img=8, c_in=4,
                non_lin="relu", **cfg_over):
    """One param tree, two views of it: cfg with dual_stream off and on.

    Both ListGlow instances share the identical variables (the dual
    executor reads the module path's tree), so any output difference is
    purely the executor's float reassociation."""
    base_kw = dict(L=L, K=K, n_units_affine=8, n_units_prior=8,
                   clamp_type=clamp, lu_decomposed=lu, non_lin=non_lin)
    base_kw.update(cfg_over)
    m_off = ListGlow(c_in, img, GlowConfig(dual_stream=False, **base_kw))
    m_on = ListGlow(c_in, img, GlowConfig(dual_stream=True, **base_kw))
    x = jax.random.normal(jax.random.key(0), (B, img, img, c_in)) * 0.1
    conds = [
        jax.random.normal(
            jax.random.key(10 + l),
            (B, img // 2 ** (l + 1), img // 2 ** (l + 1), COND_C))
        for l in range(L)
    ]
    base = jax.random.normal(
        jax.random.key(20), (B, img // 2 ** L, img // 2 ** L, 5))
    v = m_off.init(jax.random.key(1), x, conds, base, jax.random.key(2))
    # nudge the 1-d params (actnorm logs/bias, conv gains) off their zero
    # init so folds/logdets are exercised with non-trivial values
    p = jax.tree_util.tree_map(
        lambda a: a + 0.1 * jax.random.normal(jax.random.key(3), a.shape)
        if a.ndim == 1 else a, v["params"])
    var = {"params": p, **{k: v[k] for k in v if k != "params"}}
    return m_off, m_on, var, x, conds, base


@pytest.mark.parametrize("clamp", ["realnvp", "glow", "softclamp", "none"])
def test_dual_stream_f_equivalence(clamp):
    """dual_stream f output + logdet == module path, all 4 clamp types."""
    m_off, m_on, var, x, conds, _ = _dual_setup(clamp=clamp)
    z0, ld0 = m_off.apply(var, x, conds, jnp.zeros(B), method=ListGlow.f)
    z1, ld1 = m_on.apply(var, x, conds, jnp.zeros(B), method=ListGlow.f)
    np.testing.assert_allclose(z1, z0, atol=3e-6, rtol=3e-6)
    np.testing.assert_allclose(ld1, ld0, atol=2e-4, rtol=1e-6)


def test_dual_stream_f_equivalence_non_lu():
    """lu_decomposed=False: no 'consts' collection exists at all — the
    executor must fall back to .get and take the slogdet branch
    (ADVICE r4: this crashed with KeyError before the fix)."""
    m_off, m_on, var, x, conds, _ = _dual_setup(lu=False)
    assert "consts" not in var  # the very precondition that crashed
    z0, ld0 = m_off.apply(var, x, conds, jnp.zeros(B), method=ListGlow.f)
    z1, ld1 = m_on.apply(var, x, conds, jnp.zeros(B), method=ListGlow.f)
    np.testing.assert_allclose(z1, z0, atol=3e-6, rtol=3e-6)
    np.testing.assert_allclose(ld1, ld0, atol=2e-4, rtol=1e-6)


def test_dual_stream_f_equivalence_deep():
    """L=3, K=3, leakyrelu — different static structure than the default."""
    m_off, m_on, var, x, conds, _ = _dual_setup(
        L=3, K=3, img=16, non_lin="leakyrelu")
    z0, ld0 = m_off.apply(var, x, conds, jnp.zeros(B), method=ListGlow.f)
    z1, ld1 = m_on.apply(var, x, conds, jnp.zeros(B), method=ListGlow.f)
    np.testing.assert_allclose(z1, z0, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(ld1, ld0, atol=5e-4, rtol=1e-6)


def test_dual_stream_gradients_match():
    """loss + per-tensor grads through log_prob: dual == module path."""
    grads, vals = {}, {}
    for dual in (False, True):
        m_off, m_on, var, x, conds, base = _dual_setup()
        m = m_on if dual else m_off
        rest = {k: var[k] for k in var if k != "params"}

        def loss(p):
            _, nll = m.apply({"params": p, **rest}, x, conds, base,
                             jax.random.key(5), method=ListGlow.log_prob)
            return jnp.mean(nll)

        vals[dual], grads[dual] = jax.value_and_grad(loss)(var["params"])
    np.testing.assert_allclose(vals[True], vals[False], rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3),
        grads[True], grads[False])


def test_dual_stream_g_unaffected():
    """The executor is f-only: g with dual_stream=True must equal the
    module path's g bit-for-bit (same rng stream, same modules)."""
    m_off, m_on, var, x, conds, _ = _dual_setup()
    z, _ = m_off.apply(var, x, conds, jnp.zeros(B), method=ListGlow.f)
    g0 = m_off.apply(var, z, conds, jax.random.key(4), method=ListGlow.g)
    g1 = m_on.apply(var, z, conds, jax.random.key(4), method=ListGlow.g)
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))


@pytest.mark.parametrize("case", ["ddi", "packed", "coupling_norm",
                                  "batchnorm_flow", "no_fold"])
def test_dual_stream_gate_falls_back(case, monkeypatch):
    """Ineligible configs must route around _dual_scale entirely — proven
    by poisoning it, not by absence of a crash."""
    from recurrent_flows_tpu.flows import glow as glow_mod

    kw, apply_kw = {}, {}
    if case == "packed":
        kw["packed_layout"] = "sublane"
    elif case == "coupling_norm":
        kw["coupling_norm"] = "batchnorm"
    elif case == "batchnorm_flow":
        kw["flow_norm"] = "batchnorm"
    elif case == "no_fold":
        kw["fold_weights"] = False
    m_off, m_on, var, x, conds, _ = _dual_setup(**kw)
    if case == "ddi":
        apply_kw = dict(ddi=True)

    def _poisoned(self, *a, **k):
        raise AssertionError("_dual_scale must not run for this config")

    monkeypatch.setattr(glow_mod.ListGlow, "_dual_scale", _poisoned)
    mutable = ["ddi_stats"] if case == "ddi" else \
        (["batch_stats"] if case in ("coupling_norm", "batchnorm_flow") else [])
    if mutable:
        apply_kw["mutable"] = mutable
    out = m_on.apply(var, x, conds, jnp.zeros(B), method=ListGlow.f,
                     **apply_kw)
    z, ld = out[0] if mutable else out
    assert jnp.all(jnp.isfinite(z)) and jnp.all(jnp.isfinite(ld))


def test_dual_stream_gate_engages(monkeypatch):
    """And the eligible default config must actually take the executor."""
    from recurrent_flows_tpu.flows import glow as glow_mod

    m_off, m_on, var, x, conds, _ = _dual_setup()
    calls = []
    orig = glow_mod.ListGlow._dual_scale

    def _spy(self, *a, **k):
        calls.append(a[0])
        return orig(self, *a, **k)

    monkeypatch.setattr(glow_mod.ListGlow, "_dual_scale", _spy)
    m_on.apply(var, x, conds, jnp.zeros(B), method=ListGlow.f)
    assert calls == [0, 1]  # once per scale
    calls.clear()
    m_off.apply(var, x, conds, jnp.zeros(B), method=ListGlow.f)
    assert calls == []  # default-off config never enters
