"""Core numeric helpers shared by the flow library and models.

TPU-native NHWC equivalents of the reference's tensor utilities
(reference: Utils/utils.py:25-98). All channel operations act on the
*last* axis (NHWC), whereas the reference acts on axis 1 (NCHW).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def split_feature(x: jax.Array, kind: str = "split"):
    """Split channels (last axis).

    ``"split"``: contiguous halves; ``"cross"``: even/odd interleave.
    Mirrors reference Utils/utils.py:86-91 (which splits NCHW axis 1).
    """
    c = x.shape[-1]
    if kind == "split":
        return x[..., : c // 2], x[..., c // 2 :]
    elif kind == "cross":
        return x[..., 0::2], x[..., 1::2]
    raise ValueError(f"unknown split kind: {kind}")


def batch_reduce(x: jax.Array) -> jax.Array:
    """Sum over everything but the leading (batch) axis -> [B].

    Reference: Utils/utils.py:25-28.
    """
    return jnp.sum(x.reshape(x.shape[0], -1), axis=-1)


def free_bits_kl(kl: jax.Array, free_bits: float = 0.0, eps: float = 1e-6) -> jax.Array:
    """Elementwise clamp of the KL at ``free_bits`` (reference Utils/utils.py:93-98)."""
    if free_bits < eps:
        return kl
    return jnp.maximum(kl, free_bits)


def normal_log_prob(x: jax.Array, mean: jax.Array, std: jax.Array) -> jax.Array:
    """log N(x; mean, std) elementwise — same formula as torch.distributions.Normal."""
    return -0.5 * jnp.square((x - mean) / std) - jnp.log(std) - _LOG_SQRT_2PI


def normal_kl(mean_q, std_q, mean_p, std_p) -> jax.Array:
    """KL(N(mean_q, std_q) || N(mean_p, std_p)) elementwise (analytic)."""
    var_ratio = jnp.square(std_q / std_p)
    t1 = jnp.square((mean_q - mean_p) / std_p)
    return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))


def normal_sample(key: jax.Array, mean: jax.Array, std: jax.Array) -> jax.Array:
    """Reparameterized draw from N(mean, std)."""
    return mean + std * jax.random.normal(key, mean.shape, dtype=mean.dtype)


def squeeze2d(x: jax.Array) -> jax.Array:
    """Space-to-depth [B,H,W,C] -> [B,H/2,W/2,4C].

    Output channel order is (c, h-offset, w-offset) with c slowest, matching
    the reference's NCHW permute order (Flow/glow_modules.py:298-304) so the
    two layouts are channel-permutation-identical.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [B, H/2, W/2, C, 2, 2]
    return x.reshape(b, h // 2, w // 2, c * 4)


def unsqueeze2d(x: jax.Array) -> jax.Array:
    """Depth-to-space inverse of :func:`squeeze2d`."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, c // 4, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # [B, H, 2, W, 2, C/4]
    return x.reshape(b, h * 2, w * 2, c // 4)


def pack_chw(x: jax.Array) -> jax.Array:
    """[B, H, W, C] -> packed [B, C, H*W] (channel-sublane layout).

    The flow's x-stream tensors have few channels (C=4..64); NHWC puts C
    in the TPU lane dimension, which pads to 128 (32x memory/bandwidth
    blowup at C=4). Packed [B, C, S] puts the large spatial extent in
    lanes and C in sublanes, so per-channel elementwise ops, the 1x1
    invertible conv (a matmul over C), and channel splits/concats move
    only their logical bytes. Exact transpose+reshape — no math change.
    """
    b, h, w, c = x.shape
    return x.transpose(0, 3, 1, 2).reshape(b, c, h * w)


def unpack_chw(x: jax.Array, h: int, w: int) -> jax.Array:
    """Packed [B, C, H*W] -> [B, H, W, C] (inverse of :func:`pack_chw`)."""
    b, c, _ = x.shape
    return x.reshape(b, c, h, w).transpose(0, 2, 3, 1)


def pack_cw(x: jax.Array) -> jax.Array:
    """[B, H, W, C] -> [B, H, C*W] (channel-major lane packing).

    The alternative packing to :func:`pack_chw`: rows stay (B, H) and the
    lane dimension holds all C channels of a full image row, channel-major
    (lane index = c*W + w). At the flow's scales C*W is ~128, so the lane
    dim is fully utilized, the invertible 1x1 conv becomes ONE
    block-diagonal [C*W, C*W] MXU matmul (kron(W_1x1, I_W)), and channel
    split/concat are contiguous lane slices. Exact transpose+reshape —
    no math change.
    """
    b, h, w, c = x.shape
    return x.transpose(0, 1, 3, 2).reshape(b, h, c * w)


def unpack_cw(x: jax.Array, c: int) -> jax.Array:
    """Packed [B, H, C*W] -> [B, H, W, C] (inverse of :func:`pack_cw`)."""
    b, h, cw = x.shape
    w = cw // c
    return x.reshape(b, h, c, w).transpose(0, 1, 3, 2)


def conv_output_size(dims, kernels, paddings, strides, dilations=None,
                     output_paddings=None, transpose: bool = False):
    """Conv / transposed-conv output-shape calculator.

    Reference Utils/utils.py:63-84 (used to size the SRNN/VRNN dense heads).
    ``dims`` is (h, w); the per-layer lists apply in order.
    """
    out_h, out_w = dims
    dilations = dilations or [1] * len(kernels)
    if not transpose:
        for k, p, s, d in zip(kernels, paddings, strides, dilations):
            out_h = (out_h + 2 * p - d * (k - 1) - 1) // s + 1
            out_w = (out_w + 2 * p - d * (k - 1) - 1) // s + 1
    else:
        assert output_paddings is not None, "transpose needs output_paddings"
        for k, p, s, d, op in zip(kernels, paddings, strides, dilations,
                                  output_paddings):
            out_h = (out_h - 1) * s - 2 * p + d * (k - 1) + op + 1
            out_w = (out_w - 1) * s - 2 * p + d * (k - 1) + op + 1
    return out_h, out_w
