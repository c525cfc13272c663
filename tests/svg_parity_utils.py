"""Shared machinery for SVG parity against the PyTorch reference.

Builds SVG-LP in both frameworks (64x64 — the reference encoder/decoder
are hardwired to that geometry) with IDENTICAL weights, and provides
matched noise injection. (VERDICT r2 item #1.)

Reference counterpart: SVG/SVG.py:15-271 (adapted from edenton/svg).

The reference's gaussian_lstm emits softplus(linear) but then
reparameterizes and KLs it AS IF it were a log-variance
(SVG.py:176-179,266-271) — a units inconsistency our rebuild deliberately
fixes (std used as std). Exact parity runs therefore patch the reference
to the std semantics (``patch_ref_std_semantics``); the unpatched-vs-
patched gap is the quantified deviation (test_parity_srnn_vrnn_svg.py).
"""

from __future__ import annotations

import sys
import types
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import torch

torch.Tensor.cuda = lambda self, *a, **k: self  # reference hardcodes .cuda()
torch.distributions.Distribution.set_default_validate_args(False)
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

from SVG.SVG import SVG as RefSVG  # noqa: E402

from recurrent_flows_tpu.config import SVGConfig  # noqa: E402
from recurrent_flows_tpu.models import SVG  # noqa: E402
from recurrent_flows_tpu.models.svg import _CHANNELS, _DEC_LAYERS, _LAYERS  # noqa: E402
from rfn_parity_utils import _copy_conv, _t  # noqa: E402

IMG, CIN = 64, 1
ZD, CF, HDIM = 4, 16, 24


def our_config(**overrides) -> SVGConfig:
    base = dict(
        x_channels=CIN, image_size=IMG, z_dim=ZD, c_features=CF, h_dim=HDIM,
        posterior_rnn_layers=1, predictor_rnn_layers=2, prior_rnn_layers=1,
        loss_type="mse", variance=1.0, norm_type="batchnorm",
    )
    base.update(overrides)
    return SVGConfig(**base)


def ref_args(batch_size: int, cfg) -> SimpleNamespace:
    return SimpleNamespace(
        batch_size=batch_size,
        x_dim=[batch_size, CIN, IMG, IMG],
        z_dim=cfg.z_dim,
        c_features=cfg.c_features,
        h_dim=cfg.h_dim,
        posterior_rnn_layers=cfg.posterior_rnn_layers,
        predictor_rnn_layers=cfg.predictor_rnn_layers,
        prior_rnn_layers=cfg.prior_rnn_layers,
        loss_type=cfg.loss_type,
        variance=cfg.variance,
        n_conditions=2,
        n_predictions=2,
    )


# --- weight copy: ours -> reference -----------------------------------------


def _copy_linear(tlin, p):
    tlin.weight.data = _t(np.asarray(p["kernel"]).T)
    if tlin.bias is not None and "bias" in p:
        tlin.bias.data = _t(p["bias"])


def _copy_bn(tbn, p):
    tbn.weight.data = _t(p["scale"])
    tbn.bias.data = _t(p["bias"])


def _copy_vgg(tvgg_main, p, prefix):
    """one reference vgg_layer (.main = [Conv2d, BatchNorm2d, LeakyReLU]).

    With our norm_type='none' there are no norm params (pair with
    strip_batchnorm on the reference)."""
    _copy_conv(tvgg_main[0], p[f"{prefix}_conv"])
    if f"{prefix}_norm" in p:
        _copy_bn(tvgg_main[1], p[f"{prefix}_norm"])


def _copy_deconv_flip(tdeconv, p):
    """flax kernel [kh,kw,in,out] -> torch ConvTranspose2d [in,out,kh,kw],
    spatially flipped (flax ConvTranspose does not flip; torch's does)."""
    k = np.asarray(p["kernel"])[::-1, ::-1]
    tdeconv.weight.data = _t(np.ascontiguousarray(k.transpose(2, 3, 0, 1)))
    if tdeconv.bias is not None and "bias" in p:
        tdeconv.bias.data = _t(p["bias"])


def _copy_conv_as_deconv(tdeconv, p):
    """our 3x3 s1 conv -> reference ConvTranspose2d(k=3,s=1,p=1): same map
    with the kernel flipped and in/out swapped."""
    k = np.asarray(p["kernel"])[::-1, ::-1]  # [kh,kw,in,out] flipped
    tdeconv.weight.data = _t(np.ascontiguousarray(k.transpose(2, 3, 0, 1)))
    tdeconv.bias.data = _t(p["bias"])


def _copy_dense_lstm(tlstm, p, in_dim: int, hidden: int):
    """SVGLSTM/SVGGaussianLSTM stack -> reference lstm_svg/gaussian_lstm.

    Our fused Dense gates kernel is [in+h, 4h] with gate order (i,f,g,o) —
    identical to torch LSTMCell's row chunks; split into weight_ih /
    weight_hh, put the whole bias in bias_ih.
    """
    _copy_linear(tlstm.embed, p["embed"])
    for i, cell in enumerate(tlstm.lstm):
        k = np.asarray(p[f"cell{i}"]["gates"]["kernel"])  # [h(+h), 4h]
        b = np.asarray(p[f"cell{i}"]["gates"]["bias"])
        cell.weight_ih.data = _t(k[:hidden].T)
        cell.weight_hh.data = _t(k[hidden:].T)
        cell.bias_ih.data = _t(b)
        cell.bias_hh.data = torch.zeros_like(cell.bias_hh.data)


def copy_svg_weights(tmodel: "RefSVG", variables, cfg: SVGConfig) -> None:
    p = variables["params"]
    enc, dec = p["encoder"], p["decoder"]

    # encoder stages c1..c4 then bottleneck c5
    for s, tstage in enumerate((tmodel.encoder.c1, tmodel.encoder.c2,
                                tmodel.encoder.c3, tmodel.encoder.c4)):
        for l in range(_LAYERS[s]):
            _copy_vgg(tstage[l].main, enc, f"c{s}_{l}")
    _copy_conv(tmodel.encoder.c5[0], enc["bottleneck"])
    if "bottleneck_norm" in enc:
        _copy_bn(tmodel.encoder.c5[1], enc["bottleneck_norm"])

    # decoder: upc1 deconv, stages upc2/upc3/upc4/out
    _copy_deconv_flip(tmodel.decoder.upc1[0], dec["up0"])
    if "up0_norm" in dec:
        _copy_bn(tmodel.decoder.upc1[1], dec["up0_norm"])
    stage_of = {3: tmodel.decoder.upc2, 2: tmodel.decoder.upc3,
                1: tmodel.decoder.upc4}
    for s, tstage in stage_of.items():
        for l in range(_DEC_LAYERS[s]):
            _copy_vgg(tstage[l].main, dec, f"d{s}_{l}")
    _copy_vgg(tmodel.decoder.out[0].main, dec, "d0_0")
    _copy_conv_as_deconv(tmodel.decoder.out[1], dec["out_conv"])

    # LSTMs
    _copy_dense_lstm(tmodel.frame_predictor, p["frame_predictor"],
                     cfg.c_features + cfg.z_dim, cfg.h_dim)
    _copy_linear(tmodel.frame_predictor.output[0], p["frame_predictor"]["out"])
    for tg, name in ((tmodel.posterior, "posterior"), (tmodel.prior, "prior")):
        _copy_dense_lstm(tg, p[name], cfg.c_features, cfg.h_dim)
        _copy_linear(tg.mu_net, p[name]["mu"])
        _copy_linear(tg.std_net[0], p[name]["std"])


def build_pair(batch_size: int, seq_len: int, seed: int = 0, **cfg_overrides):
    cfg = our_config(**cfg_overrides)
    model = SVG(cfg, remat=False)
    x0 = jnp.zeros((batch_size, max(seq_len, 2), IMG, IMG, CIN))
    variables = model.init(jax.random.key(seed), x0, jax.random.key(seed + 1))
    tmodel = RefSVG(ref_args(batch_size, cfg))
    copy_svg_weights(tmodel, variables, cfg)
    return model, variables, tmodel, cfg


def strip_batchnorm(tmodel) -> None:
    """Replace every BatchNorm2d in the reference SVG with Identity.

    The reference encoder normalizes per B-sized call (one frame batch per
    step, SVG.py:233-242) while our TPU-first loss encodes all B*T frames
    in ONE batched call — under batchnorm the batch-statistic scopes
    differ, so exact parity is only well-defined with the norm off. The
    BN-on gap is quantified separately (test_svg_batchnorm_scope_deviation).
    Pair with our norm_type='none'.
    """
    for mod in tmodel.modules():
        for name, child in list(mod.named_children()):
            if isinstance(child, torch.nn.BatchNorm2d):
                setattr(mod, name, torch.nn.Identity())


# --- noise injection + semantics patch ---------------------------------------


def svg_loss_noise(rng, cfg, batch: int, seq_len: int):
    """The posterior eps draws our SVG.loss(rng) consumes: per step, ONE
    key feeds both the posterior and prior gaussian LSTMs (prior draw is
    discarded by the loss)."""
    keys = jax.random.split(rng, seq_len - 1)
    return [np.asarray(jax.random.normal(k, (batch, cfg.z_dim))) for k in keys]


def inject_gaussian_lstm(tg, eps_queue, std_semantics: bool,
                         dtype=torch.float32):
    """Replace a reference gaussian_lstm's reparameterize with one that
    consumes our eps draws; optionally with std (not logvar) semantics."""
    q = [_t(e).to(dtype) for e in eps_queue]

    def reparameterize(self, mu, stdp):
        eps = q.pop(0)
        if std_semantics:
            return mu + stdp * eps
        return mu + (stdp * 0.5).exp() * eps

    tg.reparameterize = types.MethodType(reparameterize, tg)


def patch_ref_std_semantics(tmodel):
    """Make the reference treat the softplus head output as a std (our
    semantics) in its analytic KL, so exact parity is testable; the
    UNPATCHED reference quantifies the deviation."""

    def kl_criterion(self, mu1, s1, mu2, s2):
        kld = (torch.log(s2 / s1)
               + (s1 ** 2 + (mu1 - mu2) ** 2) / (2 * s2 ** 2) - 0.5)
        return kld.sum() / self.batch_size

    tmodel.kl_criterion = types.MethodType(kl_criterion, tmodel)


def ref_loss(tmodel, x_nhwc, eps, std_semantics=True):
    """Reference SVG.loss with injected noise -> dict of floats.

    The loss consumes [posterior, prior] draws per step; prior draws are
    discarded so inject zeros there.
    """
    inject_gaussian_lstm(tmodel.posterior, list(eps), std_semantics)
    inject_gaussian_lstm(
        tmodel.prior, [np.zeros_like(e) for e in eps], std_semantics)
    if std_semantics:
        patch_ref_std_semantics(tmodel)
    tx = torch.tensor(np.asarray(x_nhwc, np.float32).transpose(0, 1, 4, 2, 3))
    kl, nll = tmodel.loss(tx)
    return dict(kl=float(kl), nll=float(nll))
