"""Image/video quality metrics in pure JAX (no scikit-image dependency).

SSIM follows scikit-image's structural_similarity defaults (7x7 uniform
window, K1=0.01, K2=0.03, sample covariance normalization) since that is
what the reference's eval loop calls per frame per channel
(evaluation_metrics/error_metrics.py:154-171).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(a, b):
    """Mean squared error over all but the leading batch axes."""
    diff = jnp.square(a - b)
    return jnp.mean(diff.reshape(diff.shape[0], -1), axis=-1)


def psnr(a, b, data_range: float = 1.0):
    """Peak signal-to-noise ratio per batch element."""
    m = mse(a, b)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(m, 1e-12))


def _uniform_filter(x, size: int = 7):
    """Mean filter with a size x size window, 'valid' region (NHW input)."""
    k = jnp.ones((size, size), x.dtype) / (size * size)
    return jax.lax.conv_general_dilated(
        x[:, :, :, None],
        k[:, :, None, None],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[..., 0]


def ssim(a, b, data_range: float = 1.0, win_size: int = 7):
    """Mean SSIM per batch element; a, b: [B, H, W] single-channel.

    Matches scikit-image structural_similarity(gaussian_weights=False)
    semantics: uniform window, unbiased covariance normalization
    cov_norm = NP/(NP-1).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    NP = win_size ** 2
    cov_norm = NP / (NP - 1)

    ux = _uniform_filter(a, win_size)
    uy = _uniform_filter(b, win_size)
    uxx = _uniform_filter(a * a, win_size)
    uyy = _uniform_filter(b * b, win_size)
    uxy = _uniform_filter(a * b, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    s = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
        (ux ** 2 + uy ** 2 + C1) * (vx + vy + C2)
    )
    return jnp.mean(s.reshape(s.shape[0], -1), axis=-1)


def eval_seq(true, pred, data_range: float = 1.0):
    """Per-frame per-channel SSIM/PSNR + MSE for video batches.

    true, pred: [B, T, H, W, C] -> dict of [B, T] arrays (channel-averaged
    SSIM/PSNR like the reference's eval_seq, error_metrics.py:154-171).
    """
    b, t, h, w, c = true.shape
    tr = true.transpose(0, 1, 4, 2, 3).reshape(b * t * c, h, w)
    pr = pred.transpose(0, 1, 4, 2, 3).reshape(b * t * c, h, w)
    s = ssim(tr, pr, data_range).reshape(b, t, c).mean(-1)
    p = psnr(tr, pr, data_range).reshape(b, t, c).mean(-1)
    m = mse(
        true.reshape(b * t, -1)[:, None], pred.reshape(b * t, -1)[:, None]
    ).reshape(b, t)
    return dict(ssim=s, psnr=p, mse=m)
