"""VGG-style structure-DSL feature extractor & condition generator (NHWC).

TPU-native equivalents of reference Utils/modules.py:43-120 (VGG_downscaler)
and :147-214 (VGG_upscaler). Blocks are built from the hyphen DSL
(int = 3x3 conv, 'pool' = maxpool/2, 'conv' = strided conv x scale channels,
'squeeze' = space-to-depth; upscaler: 'upsample' nearest x2, 'deconv'
transposed conv / scale channels, 'squeeze' depth-to-space).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..utils.numerics import squeeze2d, unsqueeze2d
from .layers import NormLayer, act, conv2d, deconv2d


def _upsample_nearest2x(x):
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def downscaler_layer_sizes(structures, in_channels: int, image_size: int,
                           scale: int = 2) -> List[Tuple[int, int, int]]:
    """Per-block output (H, W, C) — reference VGG_downscaler.get_layer_size."""
    c, h = in_channels, image_size
    out = []
    for structure in structures:
        for i in structure:
            if i == "pool":
                h //= 2
            elif i == "conv":
                h //= 2
                c = int(c * scale)
            elif i == "squeeze":
                h //= 2
                c *= 4
            else:
                c = int(i)
        out.append((h, h, c))
    return out


class VGGDownscaler(nn.Module):
    """Feature extractor; returns a list of per-block outputs when skip_con.

    The last layer of the last block is Tanh'ed to bound activations
    (reference Utils/modules.py:57-59).
    """

    structures: Sequence[Sequence]
    norm_type: str = "batchnorm"
    non_lin: str = "relu"
    scale: int = 2
    skip_con: bool = False
    tanh: bool = False
    dtype: object = None  # compute dtype for the convs (e.g. bf16)
    track_running_stats: bool = False

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        L = len(self.structures)
        outputs = []
        for l, structure in enumerate(self.structures):
            n = len(structure)
            for count, i in enumerate(structure, start=1):
                if l == L - 1 and count == n:
                    activation = jnp.tanh
                elif count == n and self.tanh:
                    activation = lambda v: 0.5 * jnp.tanh(v)
                else:
                    activation = lambda v: act(v, self.non_lin)
                name = f"b{l}_{count}"
                if i == "pool":
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                elif i == "conv":
                    ch = int(x.shape[-1] * self.scale)
                    x = conv2d(ch, 3, stride=2, use_bias=False, name=name, dtype=self.dtype)(x)
                    x = NormLayer(self.norm_type, track_running_stats=self.track_running_stats, name=name + "_norm")(x, use_running_average)
                    x = activation(x)
                elif i == "squeeze":
                    x = squeeze2d(x)
                    x = NormLayer(self.norm_type, track_running_stats=self.track_running_stats, name=name + "_norm")(x, use_running_average)
                    x = activation(x)
                else:
                    x = conv2d(int(i), 3, use_bias=False, name=name, dtype=self.dtype)(x)
                    x = NormLayer(self.norm_type, track_running_stats=self.track_running_stats, name=name + "_norm")(x, use_running_average)
                    x = activation(x)
            if self.skip_con:
                outputs.append(x)
        return outputs if self.skip_con else x


class VGGUpscaler(nn.Module):
    """Condition generator for the flow: L blocks low-res -> high-res, with
    optional per-scale skip concatenation from the downscaler.

    Returns a list of L feature maps ordered high-res first, matching the
    flow's scale indexing (reference Utils/modules.py:197-214: outputs are
    reversed before returning).
    """

    structures: Sequence[Sequence]
    norm_type: str = "batchnorm"
    non_lin: str = "leakyrelu"
    scale: int = 2
    skips: bool = False
    tanh: bool = False
    dtype: object = None  # compute dtype for the convs (e.g. bf16)
    track_running_stats: bool = False

    @nn.compact
    def __call__(self, x, skip_list: Optional[Sequence] = None,
                 use_running_average: bool = False):
        L = len(self.structures)
        outputs = []
        # downscaler skips come high-res first; upscaler runs low-res first
        rev_skips = list(skip_list)[::-1] if self.skips else None
        for l, structure in enumerate(self.structures):
            up_ops = [i for i in structure if i in ("upsample", "deconv", "squeeze")]
            convs = [i for i in structure if isinstance(i, int)]
            if l > 0:
                assert len(up_ops) == 1, "each block after the first needs one up-op"
                op = up_ops[0]
                if op == "upsample":
                    x = _upsample_nearest2x(x)
                elif op == "deconv":
                    ch = x.shape[-1] // self.scale
                    x = deconv2d(ch, name=f"b{l}_up")(x)
                    x = NormLayer(self.norm_type, track_running_stats=self.track_running_stats, name=f"b{l}_up_norm")(x, use_running_average)
                    x = act(x, self.non_lin)
                elif op == "squeeze":
                    x = unsqueeze2d(x)
                    x = NormLayer(self.norm_type, track_running_stats=self.track_running_stats, name=f"b{l}_up_norm")(x, use_running_average)
                    x = act(x, self.non_lin)
            if self.skips:
                x = jnp.concatenate([x, rev_skips[l]], axis=-1)
            n = len(convs)
            for count, ch in enumerate(convs, start=1):
                if count == n and self.tanh:
                    activation = lambda v: 0.5 * jnp.tanh(v)
                else:
                    activation = lambda v: act(v, self.non_lin)
                x = conv2d(ch, 3, use_bias=False, name=f"b{l}_{count}", dtype=self.dtype)(x)
                x = NormLayer(self.norm_type, track_running_stats=self.track_running_stats, name=f"b{l}_{count}_norm")(x, use_running_average)
                x = activation(x)
            outputs.append(x)
        return outputs[::-1]
