"""Full-stack golden test: our multiscale ListGlow vs the PyTorch reference.

Builds both with identical parameters and asserts f(x) -> z and the NLL
agree to f32 tolerance (dequantization disabled / matched). This pins the
complete flow — squeeze order, per-scale conditions, split bookkeeping,
base prior — to reference semantics (Flow/glow.py:43-160).
"""

import sys
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

from Flow.glow import ListGlow as RefListGlow  # noqa: E402

from recurrent_flows_tpu.config import GlowConfig  # noqa: E402
from recurrent_flows_tpu.flows import ListGlow  # noqa: E402

from test_oracle_flows import (  # noqa: E402
    copy_actnorm,
    copy_conv2dnorm,
    copy_conv2dzeros,
    nhwc_to_torch,
)

B, IMG, CIN, COND_C, L, K = 2, 8, 2, 3, 2, 2
BASE_C = 4


def _ref_args():
    return SimpleNamespace(
        learn_prior=True,
        n_units_prior=8,
        make_conditional=True,
        base_norm="actnorm",
        non_lin_glow="relu",
        split2d_act="softplus",
        L=L,
        K=K,
        n_bits=8,
        LU_decomposed=True,
        n_units_affine=8,
        flow_norm="actnorm",
        flow_batchnorm_momentum=0.0,
        clamp_type="realnvp",
    )


def _copy_glowstep(tstep, p):
    copy_actnorm(tstep.norm, p["norm"])
    inv = p["invconv"]
    tstep.invconv.p.data = torch.tensor(np.asarray(inv_consts["p"]))
    tstep.invconv.sign_s.data = torch.tensor(np.asarray(inv_consts["sign_s"]))
    tstep.invconv.lower.data = torch.tensor(np.asarray(inv["lower"]))
    tstep.invconv.log_s.data = torch.tensor(np.asarray(inv["log_s"]))
    tstep.invconv.upper.data = torch.tensor(np.asarray(inv["upper"]))
    aff = p["affine"]
    copy_conv2dnorm(tstep.affine.net[0], aff["net0"])
    copy_conv2dnorm(tstep.affine.net[2], aff["net1"])
    copy_conv2dzeros(tstep.affine.net[4], aff["net2"])
    tstep.affine.scale.data = torch.tensor(np.asarray(aff["scale"]).reshape(-1, 1, 1))
    tstep.affine.scale_shift.data = torch.tensor(
        np.asarray(aff["scale_shift"]).reshape(-1, 1, 1)
    )


@pytest.mark.slow
def test_listglow_f_and_nll_match_reference():
    global inv_consts
    cfg = GlowConfig(L=L, K=K, n_units_affine=8, n_units_prior=8, n_bits=8)
    m = ListGlow(CIN, IMG, cfg)
    x = jax.random.uniform(jax.random.key(0), (B, IMG, IMG, CIN)) - 0.5
    conds = [
        jax.random.normal(jax.random.key(10 + l),
                          (B, IMG // 2 ** (l + 1), IMG // 2 ** (l + 1), COND_C))
        for l in range(L)
    ]
    base = jax.random.normal(jax.random.key(20), (B, IMG // 2 ** L, IMG // 2 ** L, BASE_C))
    v = m.init(jax.random.key(1), x, conds, base, jax.random.key(2))
    # perturb trainable params so nothing is at its (identity) init
    params = jax.tree.map(lambda a: a + 0.03 * np.ones(a.shape, a.dtype), v["params"])
    v = {"params": params, "consts": v["consts"]}

    # ours: deterministic (no dequant noise)
    z, nll = m.apply(v, x, conds, base, method=ListGlow.log_prob, dequantize=False)

    # reference with identical params
    args = _ref_args()
    tm = RefListGlow(
        [B, CIN, IMG, IMG],
        [[B, COND_C, IMG // 2 ** (l + 1), IMG // 2 ** (l + 1)] for l in range(L)],
        [B, BASE_C, IMG // 2 ** L, IMG // 2 ** L],
        args,
    )
    tm.eval()
    flat = list(tm.glow_frame)
    # layout: [Squeeze, K steps, Split] per scale (no split on the last)
    idx = 0
    for l in range(L):
        idx += 1  # squeeze
        for k in range(K):
            p = params[f"scale{l}_step{k}"]
            inv_consts = v["consts"][f"scale{l}_step{k}"]["invconv"]
            _copy_glowstep(flat[idx], p)
            idx += 1
        if l < L - 1:
            sp = params[f"split{l}"]
            tsplit = flat[idx]
            copy_conv2dnorm(tsplit.convcond[0], sp["cond0"])
            copy_conv2dnorm(tsplit.convcond[2], sp["cond1"])
            copy_conv2dzeros(tsplit.conv[0], sp["conv"])
            idx += 1
    copy_conv2dnorm(tm.prior[0], params["prior0"])
    copy_conv2dnorm(tm.prior[2], params["prior1"])
    copy_conv2dzeros(tm.prior[4], params["prior_out"])

    tx = nhwc_to_torch(np.asarray(x))
    tconds = [nhwc_to_torch(np.asarray(c)) for c in conds]
    tbase = nhwc_to_torch(np.asarray(base))
    with torch.no_grad():
        tz, tobj = tm.f(tx, tconds, torch.zeros(B))
        # base prior log-prob (reference log_prob adds dequant noise; we
        # reproduce its deterministic pieces: f-logdet + base log p(z))
        mean, log_scale = torch.chunk(tm.prior(tbase), 2, 1)
        import torch.distributions as td

        lp = td.Normal(mean, torch.exp(log_scale)).log_prob(tz)
        tnll = -(tobj + lp.sum(dim=(1, 2, 3)) - np.log(256.0) * CIN * IMG * IMG)

    # z comparison: ours NHWC vs theirs NCHW
    np.testing.assert_allclose(
        np.asarray(z), tz.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
    )
    ours_nll = m.apply(v, x, conds, base, method=ListGlow.log_prob,
                       dequantize=False)[1]
    np.testing.assert_allclose(np.asarray(ours_nll), tnll.numpy(), rtol=1e-4,
                               atol=0.05)
