"""LPIPS(AlexNet) in pure JAX with a weight-file loader.

The reference scores perceptual distance with the ``lpips`` package's
AlexNet backbone (evaluation_metrics/error_metrics.py:72,173-187). On a
zero-egress host the pretrained weights can't be fetched, so this module
implements the full forward path — scaling layer, AlexNet conv features,
unit-normalization, learned linear heads, spatial averaging — and loads
weights from an ``.npz`` produced by ``scripts/export_lpips_weights.py``
(run on a networked machine; a file-drop enables exact-parity LPIPS).

npz contract (all float32):
  scaling/shift [3], scaling/scale [3]
  conv{1..5}/w HWIO, conv{1..5}/b [C]
  lin{0..4}/w [C_l]   (the 1x1 nonneg LPIPS head per tapped layer)
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# (out_ch, kernel, stride, pad) for torchvision AlexNet features
_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_LIN_CHANNELS = [64, 192, 384, 256, 256]


def expected_keys() -> list:
    keys = ["scaling/shift", "scaling/scale"]
    for i in range(5):
        keys += [f"conv{i + 1}/w", f"conv{i + 1}/b", f"lin{i}/w"]
    return keys


def random_params(seed: int = 0) -> Dict[str, np.ndarray]:
    """Random weights in the loader layout (plumbing tests)."""
    rng = np.random.RandomState(seed)
    params: Dict[str, np.ndarray] = {
        "scaling/shift": np.array([-0.030, -0.088, -0.188], np.float32),
        "scaling/scale": np.array([0.458, 0.448, 0.450], np.float32),
    }
    cin = 3
    for i, (cout, k, _, _) in enumerate(_CONVS):
        params[f"conv{i + 1}/w"] = rng.normal(
            0, 0.05, (k, k, cin, cout)).astype(np.float32)
        params[f"conv{i + 1}/b"] = np.zeros((cout,), np.float32)
        params[f"lin{i}/w"] = rng.uniform(
            0, 1, (_LIN_CHANNELS[i],)).astype(np.float32)
        cin = cout
    return params


def load_params(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as data:
        params = {k: data[k] for k in data.files}
    missing = [k for k in expected_keys() if k not in params]
    if missing:
        raise ValueError(f"lpips weights file missing keys: {missing[:5]}")
    for i, (cout, k, _, _) in enumerate(_CONVS):
        got = tuple(params[f"conv{i + 1}/w"].shape)
        if got[:2] != (k, k) or got[3] != cout:
            raise ValueError(f"conv{i + 1}/w shape {got} unexpected")
        if int(np.prod(params[f"lin{i}/w"].shape)) != _LIN_CHANNELS[i]:
            raise ValueError(f"lin{i}/w size != {_LIN_CHANNELS[i]}")
    return params


def default_weights_path() -> Optional[str]:
    env = os.environ.get("RFT_LPIPS_WEIGHTS")
    if env and os.path.exists(env):
        return env
    for cand in ("./data/lpips_alex.npz", "./lpips_alex.npz"):
        if os.path.exists(cand):
            return cand
    return None


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _features(params, x):
    """[B,H,W,3] in [-1,1] -> list of the 5 tapped relu feature maps."""
    shift = jnp.asarray(params["scaling/shift"]).reshape(1, 1, 1, 3)
    scale = jnp.asarray(params["scaling/scale"]).reshape(1, 1, 1, 3)
    x = (x - shift) / scale
    feats = []
    for i, (_, _, stride, pad) in enumerate(_CONVS):
        w = jnp.asarray(params[f"conv{i + 1}/w"])
        b = jnp.asarray(params[f"conv{i + 1}/b"]).reshape(-1)
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        x = jax.nn.relu(x)
        feats.append(x)
        if i in (0, 1):
            x = _maxpool(x)
    return feats


def lpips_alex(params: Dict[str, np.ndarray], a, b) -> jnp.ndarray:
    """LPIPS distance per batch element; a, b [B,H,W,C] in [-1,1]."""
    a, b = jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)
    if a.shape[-1] == 1:
        a, b = jnp.repeat(a, 3, -1), jnp.repeat(b, 3, -1)
    fa, fb = _features(params, a), _features(params, b)
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa * jax.lax.rsqrt(jnp.sum(xa ** 2, -1, keepdims=True) + 1e-10)
        nb = xb * jax.lax.rsqrt(jnp.sum(xb ** 2, -1, keepdims=True) + 1e-10)
        lin = jnp.asarray(params[f"lin{i}/w"]).reshape(1, 1, 1, -1)
        d = jnp.sum(lin * (na - nb) ** 2, axis=-1)
        total = total + jnp.mean(d, axis=(1, 2))
    return total
