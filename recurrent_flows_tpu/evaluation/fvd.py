"""FVD — Fréchet Video Distance with a pluggable video embedder.

Reference evaluation_metrics/FVD.py + FVD_score.py embed videos with the
TF-Hub I3D graph (TF1 contrib) and compute the Fréchet distance. On
zero-egress hosts the pretrained I3D is unavailable, so the embedder is
pluggable:

  * ``embedder='i3d'`` — TF-Hub i3d-kinetics-400 when tensorflow_hub and
    its weights are importable (the reference's exact protocol);
  * ``embedder='random3d'`` (default fallback) — a deterministic
    random-feature 3D conv network. Fréchet distances under fixed random
    features are a standard proxy; numbers are self-consistent across
    models/rounds but NOT comparable to published I3D-FVD values (noted in
    the returned dict).

The Fréchet/Gaussian math matches the reference (trace-sqrt via
eigendecomposition of sigma1 @ sigma2).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def frechet_distance(mu1, sigma1, mu2, sigma2) -> float:
    """||mu1-mu2||^2 + Tr(s1 + s2 - 2 sqrt(s1 s2)) (symmetrized, stable)."""
    mu1, mu2 = np.asarray(mu1), np.asarray(mu2)
    sigma1, sigma2 = np.asarray(sigma1), np.asarray(sigma2)
    diff = np.sum((mu1 - mu2) ** 2)
    # trace of sqrt(s1 @ s2) via eigenvalues of the product (PSD pair)
    eigs = np.linalg.eigvals(sigma1 @ sigma2)
    tr_sqrt = np.sum(np.sqrt(np.maximum(eigs.real, 0.0)))
    return float(diff + np.trace(sigma1) + np.trace(sigma2) - 2.0 * tr_sqrt)


def _random3d_embed(videos: jnp.ndarray, dim: int = 256, seed: int = 0):
    """Deterministic random 3D-conv features: [B,T,H,W,C] -> [B, dim]."""
    key = jax.random.key(seed)
    x = videos.astype(jnp.float32)
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    chans = [16, 32, 64]
    for i, ch in enumerate(chans):
        k = jax.random.fold_in(key, i)
        w = jax.random.normal(k, (3, 3, 3, x.shape[-1], ch)) / np.sqrt(
            27 * x.shape[-1]
        )
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 2, 2), padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        x = jnp.tanh(x)
    feats = jnp.mean(x, axis=(1, 2, 3))  # [B, 64]
    kp = jax.random.fold_in(key, 99)
    proj = jax.random.normal(kp, (feats.shape[-1], dim)) / np.sqrt(feats.shape[-1])
    return feats @ proj


def _i3d_embed(videos: np.ndarray):  # pragma: no cover - needs network
    import tensorflow as tf
    import tensorflow_hub as hub

    module = hub.load("https://tfhub.dev/deepmind/i3d-kinetics-400/1")
    x = tf.convert_to_tensor(np.asarray(videos, np.float32))
    if x.shape[-1] == 1:
        x = tf.tile(x, [1, 1, 1, 1, 3])
    x = tf.image.resize(tf.reshape(x, [-1, *x.shape[2:]]), (224, 224))
    x = tf.reshape(x, [videos.shape[0], videos.shape[1], 224, 224, 3])
    return module.signatures["default"](x)["default"].numpy()


def _stats(feats) -> Tuple[np.ndarray, np.ndarray]:
    f = np.asarray(feats)
    mu = f.mean(0)
    sigma = np.cov(f, rowvar=False)
    return mu, sigma


def fvd(videos_real, videos_fake, embedder: str = "auto", batch: int = 16,
        i3d_weights: str = None):
    """Fréchet Video Distance between two [N,T,H,W,C] video sets in [0,1].

    Returns dict(fvd=..., embedder=...). Chunks into ``batch``-video groups
    like the reference (FVD_score.py:60-79).

    ``embedder='i3d'`` uses the pure-JAX I3D (evaluation/i3d.py) when a
    weights npz is available (``i3d_weights`` arg, RFT_I3D_WEIGHTS env, or
    ./data/i3d_kinetics400.npz — see scripts/export_i3d_weights.py), else
    falls back to the TF-Hub graph (needs network), else errors.
    """
    from . import i3d as i3d_mod

    i3d_params = None
    if embedder in ("auto", "i3d"):
        path = i3d_weights or i3d_mod.default_weights_path()
        if path is not None:
            i3d_params = i3d_mod.load_params(path)

    if embedder == "auto":
        if i3d_params is not None:
            embedder = "i3d"
        else:
            try:  # pragma: no cover
                import tensorflow_hub  # noqa: F401

                embedder = "i3d"
            except Exception:
                embedder = "random3d"

    def embed_all(videos):
        outs = []
        n = videos.shape[0]
        for i in range(0, n, batch):
            chunk = videos[i : i + batch]
            if embedder == "i3d" and i3d_params is not None:
                outs.append(i3d_mod.i3d_embed(np.asarray(chunk), i3d_params))
            elif embedder == "i3d":  # pragma: no cover - needs network
                outs.append(_i3d_embed(np.asarray(chunk)))
            else:
                outs.append(np.asarray(_random3d_embed(jnp.asarray(chunk))))
        return np.concatenate(outs, 0)

    mu1, s1 = _stats(embed_all(videos_real))
    mu2, s2 = _stats(embed_all(videos_fake))
    name = embedder if i3d_params is None or embedder != "i3d" else "i3d-jax"
    return dict(fvd=frechet_distance(mu1, s1, mu2, s2), embedder=name)
