"""Shared NN primitives (NHWC, flax.linen).

TPU-native equivalents of reference Utils/modules.py:8-41,216-244. Conv
padding is explicit ((k-1)//2 per side) so geometry matches the reference's
torch convs exactly for all strides.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def act(x: jax.Array, non_lin: str) -> jax.Array:
    """relu / leakyrelu(0.2) selector (reference Utils/modules.py:8-19)."""
    if non_lin == "relu":
        return jax.nn.relu(x)
    if non_lin == "leakyrelu":
        return jax.nn.leaky_relu(x, negative_slope=0.2)
    raise ValueError(f"unknown activation: {non_lin}")


class ActFun(nn.Module):
    non_lin: str

    @nn.compact
    def __call__(self, x):
        return act(x, self.non_lin)


def conv2d(
    features: int,
    kernel: int = 3,
    stride: int = 1,
    use_bias: bool = True,
    kernel_init=None,
    bias_init=None,
    name: str | None = None,
    dtype=None,
) -> nn.Conv:
    """3x3/1x1 conv with torch-style explicit symmetric padding.

    ``dtype`` sets the computation dtype (bf16 for MXU-bound stacks);
    params stay f32.
    """
    p = (kernel - 1) // 2
    kwargs = {}
    if kernel_init is not None:
        kwargs["kernel_init"] = kernel_init
    if bias_init is not None:
        kwargs["bias_init"] = bias_init
    return nn.Conv(
        features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((p, p), (p, p)),
        use_bias=use_bias,
        name=name,
        dtype=dtype,
        **kwargs,
    )


def deconv2d(features: int, name: str | None = None,
             use_bias: bool = False) -> nn.ConvTranspose:
    """Transposed conv k=4 s=2 p=1 (exactly 2x upsampling, torch geometry).

    Reference Utils/modules.py:176 (bias=False there); the SRNN/VRNN frame
    decoder's deconvs carry a bias (reference SRNN/SRNN.py:131-143 uses
    plain ConvTranspose2d), hence the flag.
    """
    return nn.ConvTranspose(
        features,
        kernel_size=(4, 4),
        strides=(2, 2),
        padding="SAME",  # == torch ConvTranspose2d(k=4, s=2, p=1) geometry (2x)
        use_bias=use_bias,
        name=name,
    )


class NormLayer(nn.Module):
    """{batchnorm | instancenorm | none} selector (reference Utils/modules.py:28-41).

    TPU note on 'batchnorm': by default it normalizes with current-batch
    statistics (the reference's training-mode behavior) and keeps no
    running averages — these layers can sit inside lax.scan bodies where
    mutable state is not expressible. Reference eval-mode running averages
    (torch ``model.eval()``) are available opt-in via
    ``track_running_stats=True``: stats live in the ``batch_stats``
    collection, are EMA-updated whenever the collection is mutable (i.e.
    on applies OUTSIDE scans — models refresh them via their
    ``stats_refresh`` method, see training/trainer.py:refresh_stats), and
    are used when called with ``use_running_average=True``.
    """

    norm_type: str
    use_scale_bias: bool = True
    track_running_stats: bool = False
    momentum: float = 0.1  # torch BatchNorm2d default: new = (1-m)*old + m*batch

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        if self.norm_type == "none":
            return x
        if self.norm_type == "batchnorm":
            axes = (0, 1, 2)  # per-channel over batch+space
        elif self.norm_type == "instancenorm":
            axes = (1, 2)  # per-sample, per-channel over space
        else:
            raise ValueError(f"unknown norm type: {self.norm_type}")
        if self.norm_type == "batchnorm" and self.track_running_stats:
            c = x.shape[-1]
            r_mean = self.variable("batch_stats", "running_mean", jnp.zeros, (c,))
            r_var = self.variable("batch_stats", "running_var", jnp.ones, (c,))
            if use_running_average:
                mean, var = r_mean.value, r_var.value
            else:
                mean = jnp.mean(x, axis=axes)
                var = jnp.var(x, axis=axes)
                if (self.is_mutable_collection("batch_stats")
                        and not self.is_initializing()):
                    m = self.momentum
                    # torch BatchNorm2d tracks UNBIASED variance in its
                    # running stats (normalization itself stays biased)
                    n = x.shape[0] * x.shape[1] * x.shape[2]
                    var_unbiased = var * (n / max(n - 1, 1))
                    r_mean.value = (1 - m) * r_mean.value + m * mean
                    r_var.value = (1 - m) * r_var.value + m * var_unbiased
        else:
            mean = jnp.mean(x, axis=axes, keepdims=True)
            var = jnp.var(x, axis=axes, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        if self.norm_type == "batchnorm" and self.use_scale_bias:
            c = x.shape[-1]
            gamma = self.param("scale", nn.initializers.ones, (c,))
            beta = self.param("bias", nn.initializers.zeros, (c,))
            y = y * gamma + beta
        return y


class SimpleParamNet(nn.Module):
    """Conv stack from the structure DSL -> (loc, softplus scale).

    Used as the RFN prior and encoder (reference Utils/modules.py:216-244).
    Structure entries: int = 3x3 conv to that channel count; 'pool' =
    maxpool/2; 'conv' = strided conv multiplying channels by ``scale``.
    """

    structure: Sequence
    out_channels: int
    norm_type: str = "batchnorm"
    non_lin: str = "leakyrelu"
    scale: int = 2
    track_running_stats: bool = False

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        track = self.track_running_stats
        for j, i in enumerate(self.structure):
            if i == "pool":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif i == "conv":
                ch = int(self.scale * x.shape[-1])
                x = conv2d(ch, 3, stride=2, name=f"conv_{j}")(x)
                x = NormLayer(self.norm_type, track_running_stats=track,
                              name=f"norm_{j}")(x, use_running_average)
                x = act(x, self.non_lin)
            else:
                x = conv2d(int(i), 3, name=f"conv_{j}")(x)
                x = NormLayer(self.norm_type, track_running_stats=track,
                              name=f"norm_{j}")(x, use_running_average)
                x = act(x, self.non_lin)
        out = conv2d(2 * self.out_channels, 3, name="param_conv")(x)
        loc, log_scale = jnp.split(out, 2, axis=-1)
        return loc, jax.nn.softplus(log_scale)
