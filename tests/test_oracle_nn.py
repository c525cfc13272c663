"""Golden parity: VGG scalers, ConvLSTM cell, SimpleParamNet vs the
PyTorch reference (copy our params in, compare outputs)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
torch.Tensor.cuda = lambda self, *a, **k: self
sys.path.insert(0, "/root/reference")

from Utils import modules as ref  # noqa: E402

from recurrent_flows_tpu.nn.convlstm import ConvLSTMCell  # noqa: E402
from recurrent_flows_tpu.nn.layers import SimpleParamNet  # noqa: E402
from recurrent_flows_tpu.nn.vgg import VGGDownscaler, VGGUpscaler  # noqa: E402

from test_oracle_flows import nhwc_to_torch, torch_to_nhwc  # noqa: E402

B, IMG, CIN = 2, 16, 1


def copy_plain_conv(tconv, kernel, bias=None):
    tconv.weight.data = torch.tensor(np.asarray(kernel).transpose(3, 2, 0, 1))
    if bias is not None:
        tconv.bias.data = torch.tensor(np.asarray(bias))


def test_vgg_downscaler_matches_reference():
    structures = ((4, "pool", 8), (8, "pool", 8))
    m = VGGDownscaler(structures, norm_type="none", skip_con=True)
    x = jax.random.normal(jax.random.key(0), (B, IMG, IMG, CIN))
    v = m.init(jax.random.key(1), x)

    t = ref.VGG_downscaler([list(s) for s in structures], L=2, in_channels=CIN,
                           norm_type="none", non_lin="relu", scale=2,
                           skip_con=True, tanh=False)
    # copy conv weights: torch blocks interleave [conv, NoNorm, act] / [pool]
    p = v["params"]
    conv_names = sorted(
        [k for k in p if k.startswith("b")],
        key=lambda s: (int(s[1]), int(s.split("_")[1])),
    )
    it = iter(conv_names)
    for lnet in t.l_nets:
        for layer in lnet:
            if isinstance(layer, torch.nn.Conv2d):
                name = next(it)
                copy_plain_conv(layer, p[name]["kernel"])
    t.eval()
    ours = m.apply(v, x)
    theirs = t(nhwc_to_torch(np.asarray(x)))
    for o, th in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(o), torch_to_nhwc(th), atol=1e-5)


def test_vgg_upscaler_matches_reference():
    structures = ((8,), ("upsample", 4, 4))
    size_skips = [[B, 8, 8, 8], [B, 8, 4, 4]]  # NCHW sizes, high-res first
    m = VGGUpscaler(structures, norm_type="none", skips=True)
    x = jax.random.normal(jax.random.key(0), (B, 4, 4, 6))
    skips = [
        jax.random.normal(jax.random.key(2), (B, 8, 8, 8)),  # high-res first
        jax.random.normal(jax.random.key(3), (B, 4, 4, 8)),
    ]
    v = m.init(jax.random.key(1), x, skips)

    t = ref.VGG_upscaler([list(s) for s in structures], L=2, in_channels=6,
                         norm_type="none", non_lin="leakyrelu", scale=2,
                         skips=True, size_skips=[list(s) for s in size_skips],
                         tanh=False)
    p = v["params"]
    # block 0: one conv (b0_1); block 1: two convs (b1_1, b1_2); the
    # upsample op has no params. torch layers: [conv, NoNorm, act] triples.
    copy_plain_conv(t.l_nets[0][0], p["b0_1"]["kernel"])
    copy_plain_conv(t.l_nets[1][0], p["b1_1"]["kernel"])
    copy_plain_conv(t.l_nets[1][3], p["b1_2"]["kernel"])
    t.eval()
    ours = m.apply(v, x, skips)
    tskips = [nhwc_to_torch(np.asarray(s)) for s in skips]
    theirs = t(nhwc_to_torch(np.asarray(x)), skip_list=tskips)
    # both return high-res first
    for o, th in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(o), torch_to_nhwc(th), atol=1e-5)


def test_convlstm_cell_matches_reference():
    hc = 8
    m = ConvLSTMCell(hc)
    x = jax.random.normal(jax.random.key(0), (B, 4, 4, 6))
    h = jax.random.normal(jax.random.key(1), (B, 4, 4, hc))
    c = jax.random.normal(jax.random.key(2), (B, 4, 4, hc))
    v = m.init(jax.random.key(3), x, h, c)
    # make peepholes non-trivial
    v = jax.tree.map(lambda a: a + 0.1, v)

    t = ref.ConvLSTMLayer(6, hc, [3, 3], bias=True, peephole=True)
    p = v["params"]
    t.conv[0].weight.data = torch.tensor(
        np.asarray(p["gates"]["kernel"]).transpose(3, 2, 0, 1)
    )
    t.conv[0].bias.data = torch.tensor(np.asarray(p["gates"]["bias"]))
    t.initialize_peephole(4, 4)
    t.init_done = True
    t.Wci = torch.nn.Parameter(torch.tensor(np.asarray(p["Wci"]).transpose(0, 3, 1, 2)))
    t.Wcf = torch.nn.Parameter(torch.tensor(np.asarray(p["Wcf"]).transpose(0, 3, 1, 2)))
    t.Wco = torch.nn.Parameter(torch.tensor(np.asarray(p["Wco"]).transpose(0, 3, 1, 2)))

    h2, c2 = m.apply(v, x, h, c)
    with torch.no_grad():
        th2, tc2 = t(nhwc_to_torch(np.asarray(x)),
                     [nhwc_to_torch(np.asarray(h)), nhwc_to_torch(np.asarray(c))])
    np.testing.assert_allclose(np.asarray(h2), torch_to_nhwc(th2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c2), torch_to_nhwc(tc2), atol=1e-5)


def test_simple_param_net_matches_reference():
    m = SimpleParamNet((4,), out_channels=2, norm_type="none", non_lin="leakyrelu")
    x = jax.random.normal(jax.random.key(0), (B, 4, 4, 6))
    v = m.init(jax.random.key(1), x)

    t = ref.SimpleParamNet([4], in_channels=6, out_channels=2, norm_type="none",
                           non_lin="leakyrelu")
    p = v["params"]
    copy_plain_conv(t.net[0], p["conv_0"]["kernel"], p["conv_0"]["bias"])
    copy_plain_conv(t.param_net, p["param_conv"]["kernel"], p["param_conv"]["bias"])
    t.eval()
    loc, scale = m.apply(v, x)
    with torch.no_grad():
        tloc, tscale = t(nhwc_to_torch(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(loc), torch_to_nhwc(tloc), atol=1e-5)
    np.testing.assert_allclose(np.asarray(scale), torch_to_nhwc(tscale), atol=1e-5)
