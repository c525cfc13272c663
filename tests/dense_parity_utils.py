"""Shared machinery for SRNN / VRNN parity against the PyTorch reference.

Builds tiny SRNN/VRNN models in both frameworks with IDENTICAL weights
(ours copied into the reference model), and provides matched noise
injection so loss / gradient / trajectory parity is deterministic.
Template: tests/rfn_parity_utils.py (VERDICT r2 item #1: model-level torch
parity for the non-flagship families).

Reference counterparts: SRNN/SRNN.py:11-338, VRNN/VRNN.py:11-244.

The tiny config uses image_size=16 so the enc/prior conv trunks flatten a
1x1 map — the NCHW-vs-NHWC flatten permutation vanishes and dense-head
weights copy verbatim. phi_z's UnFlatten keeps a genuine (c,h,w)-vs-
(h,w,c) permutation which is handled explicitly (_phi_z_perm).
"""

from __future__ import annotations

import sys
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import torch

torch.Tensor.cuda = lambda self, *a, **k: self  # reference hardcodes .cuda()
# torch>=1.8 validates distribution args by default; the reference (torch
# 1.7) evaluates Bernoulli.log_prob on CONTINUOUS pixels, so restore the
# old behavior for the parity runs.
torch.distributions.Distribution.set_default_validate_args(False)
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

from SRNN.SRNN import SRNN as RefSRNN  # noqa: E402
from VRNN.VRNN import VRNN as RefVRNN  # noqa: E402

from recurrent_flows_tpu.config import SRNNConfig, VRNNConfig  # noqa: E402
from recurrent_flows_tpu.models import SRNN, VRNN  # noqa: E402
from rfn_parity_utils import _copy_conv, _copy_convlstm, _t  # noqa: E402

# --- tiny parity config ------------------------------------------------------

IMG, CIN = 16, 1
HD, ZD, AD = 8, 4, 8
HU = IMG // 8  # spatial extent of phi_x features (2)
PHI_X_CH, PHI_Z_CH = 256, 128


def our_srnn_config(**overrides) -> SRNNConfig:
    base = dict(
        x_channels=CIN, image_size=IMG, h_dim=HD, z_dim=ZD, a_dim=AD,
        loss_type="bernoulli", dequantize=True, n_logistics=2, n_bits=8,
        preprocess_range="1.0", enable_smoothing=False, res_q=False,
        D=0, overshot_w=1.0, norm_type="none",
    )
    base.update(overrides)
    return SRNNConfig(**base)


def our_vrnn_config(**overrides) -> VRNNConfig:
    base = dict(
        x_channels=CIN, image_size=IMG, h_dim=HD, z_dim=ZD,
        loss_type="bernoulli", dequantize=True, n_logistics=2, n_bits=8,
        preprocess_range="1.0", norm_type="none",
    )
    base.update(overrides)
    return VRNNConfig(**base)


def ref_args(batch_size: int, cfg) -> SimpleNamespace:
    """The argparse namespace the reference SRNN/VRNN constructors read."""
    ns = SimpleNamespace(
        batch_size=batch_size,
        x_dim=[batch_size, CIN, IMG, IMG],
        condition_dim=[batch_size, CIN, IMG, IMG],
        h_dim=cfg.h_dim,
        z_dim=cfg.z_dim,
        a_dim=getattr(cfg, "a_dim", 0),
        loss_type=cfg.loss_type,
        n_bits=cfg.n_bits,
        dequantize=cfg.dequantize,
        preprocess_range=cfg.preprocess_range,
        n_logistics=cfg.n_logistics,
        norm_type=cfg.norm_type,
        enable_smoothing=getattr(cfg, "enable_smoothing", False),
        res_q=getattr(cfg, "res_q", False),
        num_shots=getattr(cfg, "D", 0),
        overshot_w=getattr(cfg, "overshot_w", 1.0),
    )
    return ns


# --- weight copy: ours -> reference -----------------------------------------


def _copy_linear(tlin, p, out_perm=None):
    k = np.asarray(p["kernel"])  # [in, out]
    w = k.T  # [out, in]
    b = np.asarray(p["bias"])
    if out_perm is not None:
        w = w[out_perm]
        b = b[out_perm]
    tlin.weight.data = _t(w)
    tlin.bias.data = _t(b)


def _phi_z_perm(h: int, w: int, ch: int) -> np.ndarray:
    """perm[t] = ours-flat-index for torch UnFlatten position t.

    Torch UnFlatten views the fc output as [C,h,w] (c slowest); ours
    reshapes to [h,w,C]. perm reorders our fc output features into torch's
    ordering.
    """
    return np.arange(h * w * ch).reshape(h, w, ch).transpose(2, 0, 1).reshape(-1)


def _copy_phi_x(tseq, p):
    """reference phi_x_t Sequential: convs at 0,3,6,9 (SRNN.py:39-52)."""
    for j, idx in enumerate((0, 3, 6, 9)):
        _copy_conv(tseq[idx], p[f"conv{j}"])


def _copy_phi_z(tseq, p):
    """reference phi_z Sequential: Linear@0, Linear@2, UnFlatten@4, Conv@5."""
    _copy_linear(tseq[0], p["fc0"])
    _copy_linear(tseq[2], p["fc1"], out_perm=_phi_z_perm(HU, HU, PHI_Z_CH))
    _copy_conv(tseq[5], p["conv"])


def _copy_convmlp(t_trunk, t_mean, t_std, p):
    """ConvMLPGaussian -> reference (enc|prior) trunk + mean/std heads.

    Requires the trunk output to be spatially 1x1 (IMG=16) so the flatten
    permutation is the identity.
    """
    assert HU // 2 == 1, "flatten permutation only trivial at 1x1"
    _copy_conv(t_trunk[0], p["trunk_conv"])
    for tseq, name in ((t_mean, "mean"), (t_std, "std")):
        for j, idx in enumerate((0, 2, 4)):
            _copy_linear(tseq[idx], p[f"{name}_fc{j}"])


def _copy_deconv(tdeconv, p):
    """flax ConvTranspose [kh,kw,in,out] -> torch ConvTranspose2d [in,out,kh,kw].

    flax ConvTranspose correlates with the kernel as-is while torch's is
    the conv gradient (spatially flipped kernel) — flip both spatial axes.
    """
    k = np.asarray(p["kernel"])[::-1, ::-1]
    tdeconv.weight.data = _t(np.ascontiguousarray(k.transpose(2, 3, 0, 1)))
    if tdeconv.bias is not None and "bias" in p:
        tdeconv.bias.data = _t(p["bias"])


def _copy_frame_decoder(tseq, p):
    """FrameDecoder -> reference dec Sequential (SRNN.py:130-146)."""
    _copy_deconv(tseq[0], p["deconv0"])
    _copy_conv(tseq[3], p["conv1"])
    _copy_deconv(tseq[6], p["deconv2"])
    _copy_conv(tseq[9], p["conv3"])
    _copy_deconv(tseq[12], p["deconv4"])


def _copy_head(tmodel, p, loss_type):
    _copy_conv(tmodel.dec_mean[0], p["out_conv"])
    if loss_type != "mol":
        tmodel.variance.data = _t(p["variance"])


def copy_srnn_weights(tmodel: "RefSRNN", variables, cfg: SRNNConfig) -> None:
    p = variables["params"]
    _copy_phi_x(tmodel.phi_x_t, p["phi_x"])
    _copy_phi_z(tmodel.phi_z, p["phi_z"])
    _copy_convmlp(tmodel.enc, tmodel.enc_mean, tmodel.enc_std, p["enc"])
    _copy_convmlp(tmodel.prior, tmodel.prior_mean, tmodel.prior_std, p["prior"])
    _copy_frame_decoder(tmodel.dec, p["dec"])
    _copy_head(tmodel, p["head"], cfg.loss_type)
    _copy_convlstm(tmodel.lstm_h.LSTMlayer, p["lstm_h"], HU, HU)
    if cfg.enable_smoothing:
        _copy_convlstm(tmodel.lstm_a.LSTMlayer, p["lstm_a"], HU, HU)

    bs = tmodel.h_0.shape[0]
    tile_sp = lambda a: _t(np.asarray(a).transpose(0, 3, 1, 2)).repeat(bs, 1, 1, 1)
    tile_v = lambda a: _t(np.asarray(a)).repeat(bs, 1)
    tmodel.h_0.data = tile_sp(p["h_0"])
    tmodel.c_0.data = tile_sp(p["c_0"])
    tmodel.a_0.data = tile_sp(p["a_0"])
    tmodel.ca_0.data = tile_sp(p["ca_0"])
    tmodel.z_0.data = tile_v(p["z_0"])
    tmodel.z_0x.data = tile_v(p["z_0x"])


def copy_vrnn_weights(tmodel: "RefVRNN", variables, cfg: VRNNConfig) -> None:
    p = variables["params"]
    _copy_phi_x(tmodel.phi_x_t, p["phi_x"])
    _copy_phi_z(tmodel.phi_z, p["phi_z"])
    _copy_convmlp(tmodel.enc, tmodel.enc_mean, tmodel.enc_std, p["enc"])
    _copy_convmlp(tmodel.prior, tmodel.prior_mean, tmodel.prior_std, p["prior"])
    _copy_frame_decoder(tmodel.dec, p["dec"])
    _copy_head(tmodel, p["head"], cfg.loss_type)
    _copy_convlstm(tmodel.lstm.LSTMlayer, p["lstm"], HU, HU)

    bs = tmodel.h_0.shape[0]
    tile_sp = lambda a: _t(np.asarray(a).transpose(0, 3, 1, 2)).repeat(bs, 1, 1, 1)
    tile_v = lambda a: _t(np.asarray(a)).repeat(bs, 1)
    tmodel.h_0.data = tile_sp(p["h_0"])
    tmodel.c_0.data = tile_sp(p["c_0"])
    tmodel.z_0.data = tile_v(p["z_0"])
    tmodel.z_0x.data = tile_v(p["z_0x"])


def _perturb(variables):
    """Unlike the RFN flow (zero-init couplings), every SRNN/VRNN conv is
    lecun-random at flax init, so parity is already non-trivial; the only
    perturbation needed is the learned init states (zeros at init)."""
    p = dict(variables["params"])
    for name in ("h_0", "c_0", "a_0", "ca_0", "z_0", "z_0x"):
        if name in p:
            a = np.asarray(p[name])
            rs = np.random.RandomState(hash(name) % 2 ** 31)
            p[name] = jnp.asarray(a + 0.05 * rs.randn(*a.shape).astype(np.float32))
    return {"params": p}


def build_pair(kind: str, batch_size: int, seq_len: int, seed: int = 0,
               **cfg_overrides):
    """(our model, variables, reference model) with identical weights."""
    if kind == "srnn":
        cfg = our_srnn_config(**cfg_overrides)
        model = SRNN(cfg, remat=False)
    elif kind == "vrnn":
        cfg = our_vrnn_config(**cfg_overrides)
        model = VRNN(cfg, remat=False)
    else:
        raise ValueError(kind)
    x0 = jnp.zeros((batch_size, max(seq_len, 2), IMG, IMG, CIN))
    variables = model.init(jax.random.key(seed), x0, jax.random.key(seed + 1))
    variables = _perturb(variables)
    targs = ref_args(batch_size, cfg)
    if kind == "srnn":
        tmodel = RefSRNN(targs)
        copy_srnn_weights(tmodel, variables, cfg)
    else:
        tmodel = RefVRNN(targs)
        copy_vrnn_weights(tmodel, variables, cfg)
    return model, variables, tmodel, cfg


# --- deterministic noise injection -------------------------------------------


def srnn_loss_noise(rng, cfg, batch: int, seq_len: int):
    """Replicate the draws our SRNN.loss(rng) consumes, in OUR key order.

    Per step t: k1 -> enc eps, k2 -> prior eps, k3 -> dequant uniform.
    Overshooting (D>0): depth-d prior eps from fold_in(rng, 2000+d).
    """
    keys = jax.random.split(rng, seq_len - 1)
    enc_eps, prior_eps, dequant = [], [], []
    zshape = (batch, cfg.z_dim)
    for key in keys:
        k1, k2, k3 = jax.random.split(key, 3)
        enc_eps.append(np.asarray(jax.random.normal(k1, zshape)))
        prior_eps.append(np.asarray(jax.random.normal(k2, zshape)))
        dequant.append(np.asarray(jax.random.uniform(
            k3, (batch, IMG, IMG, CIN), jnp.float32, 0.0, 1.0 / 2 ** cfg.n_bits)))
    over_eps = []
    n_t = seq_len - 1
    for d in range(cfg.D + 1 if cfg.D + 1 > 1 else 0):
        if n_t - d <= 0:
            break
        key = jax.random.fold_in(rng, 2000 + d)
        over_eps.append(np.asarray(
            jax.random.normal(key, (n_t - d, batch, cfg.z_dim))))
    return enc_eps, prior_eps, dequant, over_eps


def vrnn_loss_noise(rng, cfg, batch: int, seq_len: int):
    """Ours VRNN.loss: per step k1 -> enc eps, k2 -> dequant uniform."""
    keys = jax.random.split(rng, seq_len - 1)
    enc_eps, dequant = [], []
    for key in keys:
        k1, k2 = jax.random.split(key)
        enc_eps.append(np.asarray(jax.random.normal(k1, (batch, cfg.z_dim))))
        dequant.append(np.asarray(jax.random.uniform(
            k2, (batch, IMG, IMG, CIN), jnp.float32, 0.0, 1.0 / 2 ** cfg.n_bits)))
    return enc_eps, dequant


class DenseNoiseInjector:
    """Make the reference consume OUR noise draws, in its call order.

    ``eps_queue``: eps tensors [B, z] in the reference's td.Normal.rsample
    call order. ``dequant_queue``: uniforms for uniform_binning_correction
    (gaussian likelihood), NHWC.
    """

    def __init__(self, tmodel, eps_queue, dequant_queue=()):
        self._eps = [_t(e) for e in eps_queue]
        self._dequant = [_t(d.transpose(0, 3, 1, 2)) for d in dequant_queue]
        self._tmodel = tmodel

    def __enter__(self):
        import torch.distributions as td

        self._orig_rsample = td.Normal.rsample
        eps_q = list(self._eps)
        td.Normal.rsample = lambda dist, *a: dist.mean + dist.stddev * eps_q.pop(0)

        deq_q = list(self._dequant)
        tm = self._tmodel
        n_bins = 2.0 ** tm.bits

        def ubc(x):
            b, c, h, w = x.size()
            x_noise = x + deq_q.pop(0)
            objective = -np.log(n_bins) * c * h * w * torch.ones(b)
            return x_noise, objective

        self._orig_ubc = tm.uniform_binning_correction
        tm.uniform_binning_correction = ubc
        return self

    def __exit__(self, *exc):
        import torch.distributions as td

        td.Normal.rsample = self._orig_rsample
        self._tmodel.uniform_binning_correction = self._orig_ubc
        return False


def srnn_ref_queue(cfg, enc_eps, prior_eps, over_eps, seq_len: int):
    """Order the eps draws as the reference SRNN.loss consumes them.

    Per step (SRNN.py:271-272): z_tx = enc.rsample() THEN z_t =
    prior.rsample(). Overshooting (:314-325): i outer, d inner prior
    rsamples; term (idt, d) consumes our depth-major draw over_eps[d][idt].
    """
    q = []
    for ee, pe in zip(enc_eps, prior_eps):
        q.append(ee)
        q.append(pe)
    D = cfg.D + 1
    if D > 1:
        n_t = seq_len - 1
        for idt in range(n_t):
            for d in range(min(n_t - idt, D)):
                q.append(over_eps[d][idt])
    return q


def ref_loss(tmodel, x_nhwc: np.ndarray):
    """Reference SRNN/VRNN loss on an NHWC numpy batch -> dict of floats."""
    tx = torch.tensor(np.asarray(x_nhwc, np.float32).transpose(0, 1, 4, 2, 3))
    kl, nll = tmodel.loss(tx)
    return dict(kl=float(kl), nll=float(nll))
