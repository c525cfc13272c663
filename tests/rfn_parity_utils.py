"""Shared machinery for full-RFN parity against the PyTorch reference.

Builds a tiny RFN in both frameworks with IDENTICAL weights (ours copied
into the reference model), and provides matched loss functions. Used by
tests/test_parity_training.py and scripts/parity_training.py
(VERDICT r1 item #2: prove training parity, not just forward parity).

Reference counterparts: RFN/RFN_new.py (model), RFN/trainer.py:206-219
(loss accounting / bits-per-dim normalization).
"""

from __future__ import annotations

import sys
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import torch

torch.Tensor.cuda = lambda self, *a, **k: self  # reference hardcodes .cuda()
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

from RFN.RFN_new import RFN as RefRFN  # noqa: E402

from recurrent_flows_tpu.config import GlowConfig, RFNConfig  # noqa: E402
from recurrent_flows_tpu.models import RFN  # noqa: E402

# --- tiny parity config ------------------------------------------------------

IMG, CIN = 16, 1
HD, ZD, AD = 8, 4, 4
L, K = 2, 2
EXTRACTOR = ((8, "pool", 16), (16, "pool", 16))
UPSCALER = ((16,), ("upsample", 8))
PRIOR_STRUCT = (8,)
ENC_STRUCT = (8,)
N_UNITS = 16
HU = IMG // (2 ** L)


def our_config(**overrides) -> RFNConfig:
    base = dict(
        x_channels=CIN,
        image_size=IMG,
        h_dim=HD,
        z_dim=ZD,
        a_dim=AD,
        L=L,
        K=K,
        extractor_structure=EXTRACTOR,
        upscaler_structure=UPSCALER,
        prior_structure=PRIOR_STRUCT,
        encoder_structure=ENC_STRUCT,
        norm_type="none",
        norm_type_features="none",
        skip_connection_flow="without_skip",
        skip_connection_features=False,
        downscaler_tanh=False,
        upscaler_tanh=False,
        free_bits=0.0,
        enable_smoothing=False,
        res_q=False,
        D=0,
        glow=GlowConfig(L=L, K=K, n_units_affine=N_UNITS, n_units_prior=N_UNITS),
    )
    base.update(overrides)
    return RFNConfig(**base)


def ref_args(batch_size: int, **overrides) -> SimpleNamespace:
    """The argparse-namespace the reference RFN/ListGlow constructors read."""
    ns = SimpleNamespace(
        batch_size=batch_size,
        x_dim=[batch_size, CIN, IMG, IMG],
        condition_dim=[batch_size, CIN, IMG, IMG],
        h_dim=HD,
        z_dim=ZD,
        a_dim=AD,
        L=L,
        K=K,
        structure_scaler=2,
        norm_type="none",
        norm_type_features="none",
        temperature=0.7,
        prior_structure=list(PRIOR_STRUCT),
        encoder_structure=list(ENC_STRUCT),
        free_bits=0.0,
        skip_connection_flow="without_skip",
        skip_connection_features=False,
        downscaler_tanh=False,
        upscaler_tanh=False,
        enable_smoothing=False,
        res_q=False,
        D=0,
        overshot_w=1.0,
        extractor_structure=[list(b) for b in EXTRACTOR],
        upscaler_structure=[list(b) for b in UPSCALER],
        # ListGlow args
        learn_prior=True,
        n_units_prior=N_UNITS,
        make_conditional=True,
        base_norm="actnorm",
        non_lin_glow="relu",
        split2d_act="softplus",
        n_bits=8,
        LU_decomposed=True,
        n_units_affine=N_UNITS,
        flow_norm="actnorm",
        flow_batchnorm_momentum=0.0,
        clamp_type="realnvp",
    )
    for k, v in overrides.items():
        setattr(ns, k, v)
    return ns


# --- weight copy: ours -> reference -----------------------------------------


def _t(a):
    return torch.tensor(np.asarray(a, dtype=np.float32))


def _copy_conv(tconv, p, transpose=True):
    tconv.weight.data = _t(np.asarray(p["kernel"]).transpose(3, 2, 0, 1))
    if tconv.bias is not None and "bias" in p:
        tconv.bias.data = _t(p["bias"])


def _copy_actnorm(tact, p):
    tact.bias.data = _t(np.asarray(p["bias"]).reshape(1, -1, 1, 1))
    tact.logs.data = _t(np.asarray(p["logs"]).reshape(1, -1, 1, 1))
    tact.initialized.fill_(1)


def _copy_conv2dnorm(tmod, p):
    _copy_conv(tmod.conv, p["conv"])
    if type(tmod.norm_type).__name__ == "ActNorm":
        _copy_actnorm(tmod.norm_type, p["actnorm"])


def _copy_conv2dzeros(tmod, p):
    _copy_conv(tmod.conv, p["conv"])
    tmod.logs.data = _t(np.asarray(p["logs"]).reshape(1, -1, 1, 1))


def _copy_vgg_downscaler(tvgg, p, structures):
    names = []
    for l, structure in enumerate(structures):
        for count, i in enumerate(structure, start=1):
            if i != "pool" and i != "squeeze":
                names.append(f"b{l}_{count}")
    it = iter(names)
    for lnet in tvgg.l_nets:
        for layer in lnet:
            if isinstance(layer, torch.nn.Conv2d):
                _copy_conv(layer, p[next(it)])
    assert next(it, None) is None, "unconsumed downscaler convs"


def _copy_vgg_upscaler(tvgg, p, structures):
    for l, structure in enumerate(structures):
        convs = [i for i in structure if isinstance(i, int)]
        if l > 0 and "deconv" in structure:
            # ConvTranspose2d weight is [Cin, Cout, kh, kw]; flax
            # ConvTranspose does NOT flip kernels while torch's does, so
            # flip both spatial axes when copying
            dk = np.asarray(p[f"b{l}_up"]["kernel"])[::-1, ::-1]
            tvgg.upscales_nets[l - 1][0].weight.data = _t(
                np.ascontiguousarray(dk.transpose(2, 3, 0, 1)))
        idx = 0
        for layer in tvgg.l_nets[l]:
            if isinstance(layer, torch.nn.Conv2d):
                idx += 1
                _copy_conv(layer, p[f"b{l}_{idx}"])
        assert idx == len(convs)


def _copy_convlstm(tlayer, p, hu, wu):
    tlayer.conv[0].weight.data = _t(
        np.asarray(p["gates"]["kernel"]).transpose(3, 2, 0, 1)
    )
    tlayer.conv[0].bias.data = _t(p["gates"]["bias"])
    tlayer.initialize_peephole(hu, wu)
    tlayer.init_done = True
    for name in ("Wci", "Wcf", "Wco"):
        setattr(tlayer, name, torch.nn.Parameter(
            _t(np.asarray(p[name]).transpose(0, 3, 1, 2))))


def _copy_spn(tspn, p, structure):
    j_params = [j for j, i in enumerate(structure) if i != "pool"]
    it = iter(j_params)
    for layer in tspn.net:
        if isinstance(layer, torch.nn.Conv2d):
            _copy_conv(layer, p[f"conv_{next(it)}"])
    _copy_conv(tspn.param_net, p["param_conv"])


def _copy_glowstep(tstep, p, c):
    _copy_actnorm(tstep.norm, p["norm"])
    inv, invc = p["invconv"], c["invconv"]
    tstep.invconv.p.data = _t(invc["p"])
    tstep.invconv.sign_s.data = _t(invc["sign_s"])
    tstep.invconv.lower.data = _t(inv["lower"])
    tstep.invconv.log_s.data = _t(inv["log_s"])
    tstep.invconv.upper.data = _t(inv["upper"])
    aff = p["affine"]
    _copy_conv2dnorm(tstep.affine.net[0], aff["net0"])
    _copy_conv2dnorm(tstep.affine.net[2], aff["net1"])
    _copy_conv2dzeros(tstep.affine.net[4], aff["net2"])
    tstep.affine.scale.data = _t(np.asarray(aff["scale"]).reshape(-1, 1, 1))
    tstep.affine.scale_shift.data = _t(
        np.asarray(aff["scale_shift"]).reshape(-1, 1, 1)
    )


def _copy_listglow(tflow, p, consts, L, K):
    flat = list(tflow.glow_frame)
    idx = 0
    for l in range(L):
        idx += 1  # squeeze
        for k in range(K):
            _copy_glowstep(flat[idx], p[f"scale{l}_step{k}"],
                           consts[f"scale{l}_step{k}"])
            idx += 1
        if l < L - 1:
            sp = p[f"split{l}"]
            tsplit = flat[idx]
            _copy_conv2dnorm(tsplit.convcond[0], sp["cond0"])
            _copy_conv2dnorm(tsplit.convcond[2], sp["cond1"])
            _copy_conv2dzeros(tsplit.conv[0], sp["conv"])
            idx += 1
    _copy_conv2dnorm(tflow.prior[0], p["prior0"])
    _copy_conv2dnorm(tflow.prior[2], p["prior1"])
    _copy_conv2dzeros(tflow.prior[4], p["prior_out"])


def copy_rfn_weights(tmodel: "RefRFN", variables, cfg: RFNConfig) -> None:
    """Copy every trainable tensor of our RFN into the reference RFN."""
    p, consts = variables["params"], variables["consts"]
    _copy_vgg_downscaler(tmodel.extractor, p["extractor"], cfg.extractor_structure)
    _copy_vgg_upscaler(tmodel.upscaler, p["upscaler"], cfg.upscaler_structure)
    hu = cfg.image_size // (2 ** cfg.L)
    _copy_convlstm(tmodel.lstm.LSTMlayer, p["lstm"], hu, hu)
    if cfg.enable_smoothing:
        _copy_convlstm(tmodel.a_lstm.LSTMlayer, p["a_lstm"], hu, hu)
    _copy_spn(tmodel.prior, p["prior"], cfg.prior_structure)
    _copy_spn(tmodel.encoder, p["encoder"], cfg.encoder_structure)
    _copy_listglow(tmodel.flow, p["flow"], consts["flow"], cfg.L, cfg.K)
    # learned initial states: zeros at init on both sides; copy anyway for
    # robustness (ours are [1,...] broadcast, theirs batch-sized)
    bs = tmodel.h_0.shape[0]

    def tile(a):
        return _t(np.asarray(a).transpose(0, 3, 1, 2)).repeat(bs, 1, 1, 1)

    tmodel.h_0.data = tile(p["h_0"])
    tmodel.c_0.data = tile(p["c_0"])
    tmodel.a_0.data = tile(p["a_0"])
    tmodel.ca_0.data = tile(p["ca_0"])
    tmodel.z_0.data = tile(p["z_0"])
    tmodel.z_0x.data = tile(p["z_0x"])


def build_pair(batch_size: int, seq_len: int, seed: int = 0, **cfg_overrides):
    """(our model, variables, reference model) with identical weights."""
    cfg = our_config(**cfg_overrides)
    model = RFN(cfg, remat=False)
    x0 = jnp.zeros((batch_size, max(seq_len, 2), IMG, IMG, CIN))
    variables = model.init(jax.random.key(seed), x0, jax.random.key(seed + 1))
    # perturb params away from identity inits so parity is non-trivial
    variables = {
        "params": jax.tree.map(
            lambda a: a + 0.02 * np.ones(a.shape, np.float32)
            if a.ndim >= 3 else a,
            variables["params"],
        ),
        "consts": variables["consts"],
    }
    targs = ref_args(
        batch_size,
        enable_smoothing=cfg.enable_smoothing,
        res_q=cfg.res_q,
        D=cfg.D,
        free_bits=cfg.free_bits,
    )
    tmodel = RefRFN(targs)
    copy_rfn_weights(tmodel, variables, cfg)
    return model, variables, tmodel


# --- deterministic noise injection -------------------------------------------


def our_loss_noise(rng, batch_size: int, seq_len: int, n_bits: int = 8):
    """Replicate the exact eps/uniform draws our RFN.loss(rng) consumes.

    Per step t (keys = split(rng, T-1)): k1 -> prior eps, k2 -> encoder eps,
    k3 -> flow dequant uniform. Returns per-step lists (NHWC numpy).
    """
    keys = jax.random.split(rng, seq_len - 1)
    prior_eps, enc_eps, dequant = [], [], []
    zshape = (batch_size, HU, HU, ZD)
    for key in keys:
        k1, k2, k3 = jax.random.split(key, 3)
        prior_eps.append(np.asarray(jax.random.normal(k1, zshape)))
        enc_eps.append(np.asarray(jax.random.normal(k2, zshape)))
        dequant.append(np.asarray(jax.random.uniform(
            k3, (batch_size, IMG, IMG, CIN), jnp.float32, 0.0, 1.0 / 2 ** n_bits)))
    return prior_eps, enc_eps, dequant


class NoiseInjector:
    """Make the reference consume OUR noise draws, in its call order.

    Reference per step: prior.rsample() then encoder.rsample()
    (RFN_new.py:178-183), and flow.log_prob's uniform_binning_correction
    (Flow/glow.py:119-126).
    """

    def __init__(self, tmodel, prior_eps, enc_eps, dequant):
        eps = []
        for pe, ee in zip(prior_eps, enc_eps):
            eps.append(_t(pe.transpose(0, 3, 1, 2)))
            eps.append(_t(ee.transpose(0, 3, 1, 2)))
        self._eps = eps
        self._dequant = [_t(d.transpose(0, 3, 1, 2)) for d in dequant]
        self._tmodel = tmodel

    def __enter__(self):
        import torch.distributions as td

        self._orig_rsample = td.Normal.rsample
        eps_q = list(self._eps)
        td.Normal.rsample = lambda dist, *a: dist.mean + dist.stddev * eps_q.pop(0)

        deq_q = list(self._dequant)
        flow = self._tmodel.flow
        n_bins = 2.0 ** flow.n_bits

        def ubc(x):
            b, c, h, w = x.size()
            x_noise = x + deq_q.pop(0)
            objective = -np.log(n_bins) * c * h * w * torch.ones(b)
            return x_noise, objective

        self._orig_ubc = flow.uniform_binning_correction
        flow.uniform_binning_correction = ubc
        return self

    def __exit__(self, *exc):
        import torch.distributions as td

        td.Normal.rsample = self._orig_rsample
        self._tmodel.flow.uniform_binning_correction = self._orig_ubc
        return False


def ref_loss(tmodel, x_nhwc: np.ndarray):
    """Reference RFN.loss on an NHWC numpy batch -> dict of floats."""
    tx = torch.tensor(np.asarray(x_nhwc, np.float32).transpose(0, 1, 4, 2, 3))
    kl_fb, kl, nll = tmodel.loss(tx, logdet=0.0)
    return dict(kl_free_bits=float(kl_fb), kl=float(kl), nll=float(nll))
