"""Shared submodules for the dense-latent models (SRNN / VRNN).

NHWC equivalents of the conv/MLP stacks both reference models duplicate
(SRNN/SRNN.py:38-146, VRNN/VRNN.py:34-135): the frame feature extractor
phi_x (stride-2 conv stack to H/8 x W/8 x 256), the latent lift phi_z
(vector z -> spatial map), the conv+MLP Gaussian heads, and the deconv
frame decoder. One definition here instead of two copies.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import NormLayer, conv2d, deconv2d
from ..ops import (
    DiscretizedMixtureLogits,
    DiscretizedMixtureLogits1d,
    mol_sample_1d,
    mol_sample_rgb,
)
from ..utils.numerics import batch_reduce, normal_log_prob


class PhiX(nn.Module):
    """Frame features: [B,H,W,C] -> [B,H/8,W/8,256] (reference SRNN.py:39-52)."""

    norm_type: str = "batchnorm"
    channels: int = 256
    track_running_stats: bool = False

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        for j, (ch, stride) in enumerate([(64, 2), (128, 2), (256, 2), (self.channels, 1)]):
            x = conv2d(ch, 3, stride=stride, name=f"conv{j}")(x)
            x = NormLayer(self.norm_type,
                          track_running_stats=self.track_running_stats,
                          name=f"norm{j}")(x, use_running_average)
            x = jax.nn.relu(x)
        return x


class PhiZ(nn.Module):
    """Latent lift: [B,z] -> [B,h,w,channels] (reference SRNN.py:59-69)."""

    h: int
    w: int
    channels: int = 128
    norm_type: str = "batchnorm"
    track_running_stats: bool = False

    @nn.compact
    def __call__(self, z, use_running_average: bool = False):
        d = self.channels * self.h * self.w
        z = jax.nn.relu(nn.Dense(d, name="fc0")(z))
        z = jax.nn.relu(nn.Dense(d, name="fc1")(z))
        z = z.reshape(z.shape[0], self.h, self.w, self.channels)
        z = conv2d(self.channels, 3, name="conv")(z)
        z = NormLayer(self.norm_type,
                      track_running_stats=self.track_running_stats,
                      name="norm")(z, use_running_average)
        return jax.nn.relu(z)


class ConvMLPGaussian(nn.Module):
    """Spatial input -> (mu, softplus-std) vector heads.

    Conv trunk (stride 2) + flatten, then two 3-layer MLP heads — the
    reference's enc/prior structure (SRNN.py:71-127).
    """

    z_dim: int
    norm_type: str = "batchnorm"
    track_running_stats: bool = False

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        h = conv2d(256, 3, stride=2, name="trunk_conv")(x)
        h = NormLayer(self.norm_type,
                      track_running_stats=self.track_running_stats,
                      name="trunk_norm")(h, use_running_average)
        h = jax.nn.relu(h)
        h = h.reshape(h.shape[0], -1)

        def head(name):
            y = jax.nn.relu(nn.Dense(512, name=f"{name}_fc0")(h))
            y = jax.nn.relu(nn.Dense(256, name=f"{name}_fc1")(y))
            return nn.Dense(self.z_dim, name=f"{name}_fc2")(y)

        mean = head("mean")
        std = jax.nn.softplus(head("std"))
        return mean, std


class FrameDecoder(nn.Module):
    """[B,h,w,·] -> [B,H,W,32] deconv stack (reference SRNN.py:130-146)."""

    norm_type: str = "batchnorm"
    track_running_stats: bool = False

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        spec = [("deconv", 512), ("conv", 256), ("deconv", 64), ("conv", 64), ("deconv", 32)]
        for j, (kind, ch) in enumerate(spec):
            if kind == "deconv":
                # reference dec uses plain ConvTranspose2d (with bias)
                x = deconv2d(ch, name=f"deconv{j}", use_bias=True)(x)
            else:
                x = conv2d(ch, 3, name=f"conv{j}")(x)
            x = NormLayer(self.norm_type,
                          track_running_stats=self.track_running_stats,
                          name=f"norm{j}")(x, use_running_average)
            x = jax.nn.relu(x)
        return x


class LikelihoodHead(nn.Module):
    """dec features -> output head + NLL / sampling for the 4 loss types.

    {bernoulli | gaussian (learned scalar variance, optional dequantization)
    | mse | mol} — reference SRNN.py:172-188,289-306.
    """

    channels: int  # image channels
    loss_type: str = "bernoulli"
    preprocess_range: str = "1.0"
    n_logistics: int = 5
    n_bits: int = 8
    dequantize: bool = True

    def setup(self):
        if self.loss_type == "mol":
            out = self.n_logistics * (10 if self.channels > 1 else 3)
            self.out_conv = conv2d(out, 3, name="out_conv")
            self.mol = (
                DiscretizedMixtureLogits(self.n_logistics)
                if self.channels > 1
                else DiscretizedMixtureLogits1d(self.n_logistics)
            )
        else:
            self.out_conv = conv2d(self.channels, 3, name="out_conv")
            self.variance = self.param("variance", nn.initializers.ones, (1,))

    def params_from(self, dec):
        """Raw output map (probs / means / mol logits)."""
        y = self.out_conv(dec)
        if self.loss_type == "mol":
            return y
        if self.preprocess_range == "0.5":
            return jnp.tanh(y)
        return jax.nn.sigmoid(y)

    def nll(self, dec, x_t, rng):
        """Per-batch negative log likelihood [B]."""
        y = self.params_from(dec)
        if self.loss_type == "bernoulli":
            p = jnp.clip(y, 1e-6, 1 - 1e-6)
            ll = x_t * jnp.log(p) + (1 - x_t) * jnp.log1p(-p)
            return -batch_reduce(ll)
        if self.loss_type == "gaussian":
            n_bins = 2.0 ** self.n_bits
            x = x_t
            corr = 0.0
            if self.dequantize:
                x = x_t + jax.random.uniform(rng, x_t.shape, x_t.dtype, 0.0, 1.0 / n_bins)
                dims = x_t.shape[1] * x_t.shape[2] * x_t.shape[3]
                corr = -jnp.log(n_bins) * dims
            std = jax.nn.softplus(self.variance)
            nll = -batch_reduce(normal_log_prob(x, y, std * jnp.ones_like(y)))
            return nll - corr
        if self.loss_type == "mse":
            return batch_reduce(jnp.square(y - x_t))
        if self.loss_type == "mol":
            return -batch_reduce(self.mol.log_prob(x_t, y))
        raise ValueError(f"undefined loss {self.loss_type}")

    def decode(self, dec, rng):
        """Frame estimate for predict/reconstruct/sample paths."""
        y = self.params_from(dec)
        if self.loss_type == "mol":
            if self.channels > 1:
                return mol_sample_rgb(rng, y)
            return mol_sample_1d(rng, y)
        return y
