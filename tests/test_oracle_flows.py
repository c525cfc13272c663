"""Golden parity tests: run the PyTorch reference (CPU) as an oracle.

We copy OUR initialized parameters into the reference's torch modules and
assert forward outputs / logdets agree to f32 tolerance. This pins the
TPU rebuild's flow semantics to the reference's
(Flow/glow_modules.py) without copying any reference code.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

from Flow import glow_modules as ref  # noqa: E402

from recurrent_flows_tpu.flows import (  # noqa: E402
    ActNorm,
    AffineCoupling,
    InvConv,
    Split2d,
)

B, H, W, C = 2, 8, 8, 8
COND_C = 6


def nhwc_to_torch(x):
    return torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))


def torch_to_nhwc(x):
    return x.detach().numpy().transpose(0, 2, 3, 1)


def copy_conv(tconv, flax_params, has_bias=True):
    """flax kernel [kh,kw,in,out] -> torch [out,in,kh,kw]."""
    k = np.asarray(flax_params["kernel"]).transpose(3, 2, 0, 1)
    tconv.weight.data = torch.tensor(k)
    if has_bias and "bias" in flax_params:
        tconv.bias.data = torch.tensor(np.asarray(flax_params["bias"]))


def copy_actnorm(tact, p):
    tact.bias.data = torch.tensor(np.asarray(p["bias"]).reshape(1, -1, 1, 1))
    tact.logs.data = torch.tensor(np.asarray(p["logs"]).reshape(1, -1, 1, 1))
    tact.initialized.fill_(1)


def copy_conv2dnorm(tmod, p):
    copy_conv(tmod.conv, p["conv"], has_bias=("bias" in p["conv"]))
    if hasattr(tmod, "norm_type") and isinstance(tmod.norm_type, ref.ActNorm):
        copy_actnorm(tmod.norm_type, p["actnorm"])


def copy_conv2dzeros(tmod, p):
    copy_conv(tmod.conv, p["conv"])
    tmod.logs.data = torch.tensor(np.asarray(p["logs"]).reshape(-1, 1, 1))


def test_actnorm_matches_reference():
    x = jax.random.normal(jax.random.key(0), (B, H, W, C))
    m = ActNorm(C)
    v = m.init(jax.random.key(1), x, jnp.zeros(B))
    v = jax.tree.map(lambda a: a + 0.37, v)
    y, ld = m.apply(v, x, jnp.zeros(B))

    t = ref.ActNorm(C)
    copy_actnorm(t, v["params"])
    t.eval()
    ty, tld = t(nhwc_to_torch(x), torch.zeros(B), reverse=False)
    np.testing.assert_allclose(np.asarray(y), torch_to_nhwc(ty), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld), tld.detach().numpy() * np.ones(B), atol=1e-4)


@pytest.mark.parametrize("lu", [True, False])
def test_invconv_matches_reference(lu):
    x = jax.random.normal(jax.random.key(0), (B, H, W, C))
    m = InvConv(C, lu_decomposed=lu)
    v = m.init(jax.random.key(1), x, jnp.zeros(B))
    y, ld = m.apply(v, x, jnp.zeros(B))

    t = ref.InvConv(C, LU_decomposed=lu)
    if lu:
        t.p.data = torch.tensor(np.asarray(v["consts"]["p"]))
        t.sign_s.data = torch.tensor(np.asarray(v["consts"]["sign_s"]))
        t.lower.data = torch.tensor(np.asarray(v["params"]["lower"]))
        t.log_s.data = torch.tensor(np.asarray(v["params"]["log_s"]))
        t.upper.data = torch.tensor(np.asarray(v["params"]["upper"]))
    else:
        t.weight.data = torch.tensor(np.asarray(v["params"]["weight"]))
    ty, tld = t(nhwc_to_torch(x), torch.zeros(B), reverse=False)
    np.testing.assert_allclose(np.asarray(y), torch_to_nhwc(ty), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), tld.detach().numpy() * np.ones(B), atol=1e-4)
    # reverse too (ours: triangular solves; reference: explicit inverses)
    yr, _ = m.apply(v, x, None, reverse=True)
    tyr, _ = t(nhwc_to_torch(x), None, reverse=True)
    np.testing.assert_allclose(np.asarray(yr), torch_to_nhwc(tyr), atol=1e-5)


@pytest.mark.parametrize("clamp", ["glow", "softclamp", "realnvp", "none"])
def test_affine_coupling_matches_reference(clamp):
    x = jax.random.normal(jax.random.key(0), (B, H, W, C))
    cond = jax.random.normal(jax.random.key(2), (B, H, W, COND_C))
    m = AffineCoupling(C, hidden_units=16, clamp_type=clamp)
    v = m.init(jax.random.key(1), x, cond, jnp.zeros(B))
    # non-trivial: perturb everything (incl. zero conv) a bit
    v = {"params": jax.tree.map(lambda a: a + 0.05 * np.ones(a.shape, a.dtype), v["params"])}
    y, ld = m.apply(v, x, cond, jnp.zeros(B))

    t = ref.AffineCoupling(
        [B, C, H, W], [B, COND_C, H, W], hidden_units=16, clamp_type=clamp
    )
    p = v["params"]
    copy_conv2dnorm(t.net[0], p["net0"])
    copy_conv2dnorm(t.net[2], p["net1"])
    copy_conv2dzeros(t.net[4], p["net2"])
    if clamp == "realnvp":
        t.scale.data = torch.tensor(np.asarray(p["scale"]).reshape(-1, 1, 1))
        t.scale_shift.data = torch.tensor(np.asarray(p["scale_shift"]).reshape(-1, 1, 1))
    t.eval()
    ty, tld = t(nhwc_to_torch(x), nhwc_to_torch(cond), torch.zeros(B), reverse=False)
    np.testing.assert_allclose(np.asarray(y), torch_to_nhwc(ty), rtol=1e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(ld), tld.detach().numpy(), rtol=1e-4, atol=1e-3)


def test_split2d_matches_reference():
    x = jax.random.normal(jax.random.key(0), (B, H, W, C))
    cond = jax.random.normal(jax.random.key(2), (B, H, W, COND_C))
    m = Split2d(C, make_conditional=True, clamp_function="softplus")
    v = m.init(jax.random.key(1), x, cond, jnp.zeros(B))
    v = {"params": jax.tree.map(lambda a: a + 0.05 * np.ones(a.shape, a.dtype), v["params"])}
    z1, ld = m.apply(v, x, cond, jnp.zeros(B))

    t = ref.Split2d([B, C, H, W], [B, COND_C, H, W], make_conditional=True,
                    clamp_function="softplus")
    p = v["params"]
    copy_conv2dnorm(t.convcond[0], p["cond0"])
    copy_conv2dnorm(t.convcond[2], p["cond1"])
    copy_conv2dzeros(t.conv[0], p["conv"])
    t.eval()
    tz1, tld = t(nhwc_to_torch(x), nhwc_to_torch(cond), torch.zeros(B), reverse=False)
    np.testing.assert_allclose(np.asarray(z1), torch_to_nhwc(tz1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), tld.detach().numpy(), rtol=1e-4, atol=1e-3)
