"""LPIPS-style perceptual distance with a pluggable feature extractor.

The reference uses the `lpips` package's AlexNet backbone
(error_metrics.py:72,173-187). Pretrained AlexNet weights are unavailable
on zero-egress hosts, so:

  * if the ``lpips`` torch package imports, it is used (exact parity);
  * otherwise a deterministic random-feature conv pyramid computes the
    same normalized-feature L2 construction (unit-normalize channel
    features at each scale, average spatial L2 of differences). Random
    VGG-style features are a known reasonable perceptual proxy; values are
    self-consistent but not comparable to published LPIPS numbers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _feature_pyramid(x, seed: int = 0):
    """[B,H,W,C] in [-1,1] -> list of feature maps at 4 scales."""
    key = jax.random.key(seed)
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    feats = []
    chans = [32, 64, 128, 256]
    for i, ch in enumerate(chans):
        k = jax.random.fold_in(key, i)
        w = jax.random.normal(k, (3, 3, x.shape[-1], ch)) / np.sqrt(9 * x.shape[-1])
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = jax.nn.relu(x)
        feats.append(x)
    return feats


def lpips_distance(a, b, backend: str = "auto", weights: str = None):
    """Perceptual distance per batch element; a, b: [B,H,W,C] in [-1,1].

    ``backend='alex'`` uses the pure-JAX AlexNet-LPIPS
    (evaluation/alexnet_lpips.py) given a weights npz (``weights`` arg,
    RFT_LPIPS_WEIGHTS env, or ./data/lpips_alex.npz — produced by
    scripts/export_lpips_weights.py on a networked host).
    """
    from . import alexnet_lpips as alex_mod

    alex_params = None
    if backend in ("auto", "alex"):
        path = weights or alex_mod.default_weights_path()
        if path is not None:
            alex_params = alex_mod.load_params(path)
        elif backend == "alex":
            raise FileNotFoundError(
                "backend='alex' needs a weights npz "
                "(scripts/export_lpips_weights.py)"
            )
    if alex_params is not None:
        return alex_mod.lpips_alex(alex_params, a, b)

    if backend == "auto":
        try:  # pragma: no cover
            import lpips  # noqa: F401

            backend = "lpips"
        except Exception:
            backend = "random_features"

    if backend == "lpips":  # pragma: no cover
        import lpips as lp
        import torch

        net = lpips_distance._net if hasattr(lpips_distance, "_net") else lp.LPIPS(
            net="alex"
        )
        lpips_distance._net = net
        ta = torch.tensor(np.asarray(a).transpose(0, 3, 1, 2))
        tb = torch.tensor(np.asarray(b).transpose(0, 3, 1, 2))
        if ta.shape[1] == 1:
            ta, tb = ta.repeat(1, 3, 1, 1), tb.repeat(1, 3, 1, 1)
        with torch.no_grad():
            return jnp.asarray(net(ta, tb).squeeze().numpy())

    fa = _feature_pyramid(jnp.asarray(a))
    fb = _feature_pyramid(jnp.asarray(b))
    total = 0.0
    for xa, xb in zip(fa, fb):
        na = xa * jax.lax.rsqrt(jnp.sum(xa ** 2, -1, keepdims=True) + 1e-10)
        nb = xb * jax.lax.rsqrt(jnp.sum(xb ** 2, -1, keepdims=True) + 1e-10)
        d = jnp.mean(jnp.sum((na - nb) ** 2, -1), axis=(1, 2))
        total = total + d
    return total / len(fa)
