"""I3D (Inflated Inception-v1, Kinetics-400) in pure JAX — the FVD embedder.

The reference embeds videos with the TF-Hub ``i3d-kinetics-400`` graph
(evaluation_metrics/FVD.py:74-132, TF1 contrib). Zero-egress hosts cannot
fetch that module, so this is the full architecture with a weight-file
loader: drop an ``.npz`` whose keys mirror the public kinetics-i3d
checkpoint variable names (``RGB/inception_i3d/<unit>/conv_3d/w``,
``.../batch_norm/{beta,moving_mean,moving_variance}``) and
:func:`i3d_embed` reproduces the reference protocol. Convert a checkpoint
with ``scripts/export_i3d_weights.py`` on a networked machine.

Layout is NDHWC throughout (TPU-native; the TF checkpoint already stores
conv kernels as [t, h, w, in, out], so no transposes are needed).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

_SCOPE = "RGB/inception_i3d"

# Inception-v1 branch channel table: unit -> (b0, b1a, b1b, b2a, b2b, b3b)
MIXED_CHANNELS = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),
    "Mixed_3c": (128, 128, 192, 32, 96, 64),
    "Mixed_4b": (192, 96, 208, 16, 48, 64),
    "Mixed_4c": (160, 112, 224, 24, 64, 64),
    "Mixed_4d": (128, 128, 256, 24, 64, 64),
    "Mixed_4e": (112, 144, 288, 32, 64, 64),
    "Mixed_4f": (256, 160, 320, 32, 128, 128),
    "Mixed_5b": (256, 160, 320, 32, 128, 128),
    "Mixed_5c": (384, 192, 384, 48, 128, 128),
}

NUM_CLASSES = 400


def _conv3d(x, w, strides=(1, 1, 1)):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def _unit(params: Dict[str, np.ndarray], name: str, x, strides=(1, 1, 1)):
    """Conv3D + BatchNorm(beta only, frozen stats) + ReLU — snt.Conv3D unit."""
    w = params[f"{_SCOPE}/{name}/conv_3d/w"]
    x = _conv3d(x, jnp.asarray(w), strides)
    bn = f"{_SCOPE}/{name}/batch_norm"
    mean = jnp.asarray(params[f"{bn}/moving_mean"]).reshape(-1)
    var = jnp.asarray(params[f"{bn}/moving_variance"]).reshape(-1)
    beta = jnp.asarray(params[f"{bn}/beta"]).reshape(-1)
    x = (x - mean) * jax.lax.rsqrt(var + 1e-3) + beta
    return jax.nn.relu(x)


def _maxpool(x, window, strides):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, *window, 1), (1, *strides, 1), "SAME"
    )


def _mixed(params, name: str, x):
    b0 = _unit(params, f"{name}/Branch_0/Conv3d_0a_1x1", x)
    b1 = _unit(params, f"{name}/Branch_1/Conv3d_0a_1x1", x)
    b1 = _unit(params, f"{name}/Branch_1/Conv3d_0b_3x3", b1)
    b2 = _unit(params, f"{name}/Branch_2/Conv3d_0a_1x1", x)
    b2 = _unit(params, f"{name}/Branch_2/Conv3d_0b_3x3", b2)
    b3 = _maxpool(x, (3, 3, 3), (1, 1, 1))
    b3 = _unit(params, f"{name}/Branch_3/Conv3d_0b_1x1", b3)
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def i3d_logits(params: Dict[str, np.ndarray], video: jnp.ndarray) -> jnp.ndarray:
    """[B, T>=9, 224, 224, 3] in [-1, 1] -> Kinetics logits [B, 400].

    Mirrors kinetics-i3d InceptionI3d.__call__ with the 'Logits' endpoint
    (the TF-Hub module's `default` output used by the reference FVD).
    """
    x = video
    x = _unit(params, "Conv3d_1a_7x7", x, strides=(2, 2, 2))
    x = _maxpool(x, (1, 3, 3), (1, 2, 2))
    x = _unit(params, "Conv3d_2b_1x1", x)
    x = _unit(params, "Conv3d_2c_3x3", x)
    x = _maxpool(x, (1, 3, 3), (1, 2, 2))
    x = _mixed(params, "Mixed_3b", x)
    x = _mixed(params, "Mixed_3c", x)
    x = _maxpool(x, (3, 3, 3), (2, 2, 2))
    for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
        x = _mixed(params, name, x)
    x = _maxpool(x, (2, 2, 2), (2, 2, 2))
    x = _mixed(params, "Mixed_5b", x)
    x = _mixed(params, "Mixed_5c", x)
    # avg-pool over (2,7,7) then the logits conv (bias, no BN), mean over time
    x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 7, 7, 1), (1, 1, 1, 1, 1), "VALID"
    ) / (2 * 7 * 7)
    w = jnp.asarray(params[f"{_SCOPE}/Logits/Conv3d_0c_1x1/conv_3d/w"])
    b = jnp.asarray(params[f"{_SCOPE}/Logits/Conv3d_0c_1x1/conv_3d/b"]).reshape(-1)
    x = _conv3d(x, w) + b
    x = jnp.mean(x, axis=(2, 3))  # spatial
    return jnp.mean(x, axis=1)  # time


def expected_keys() -> list:
    """Every variable name the npz must contain (loader contract)."""
    keys = []

    def unit(name, bias=False):
        keys.append(f"{_SCOPE}/{name}/conv_3d/w")
        if bias:
            keys.append(f"{_SCOPE}/{name}/conv_3d/b")
        else:
            for s in ("beta", "moving_mean", "moving_variance"):
                keys.append(f"{_SCOPE}/{name}/batch_norm/{s}")

    unit("Conv3d_1a_7x7")
    unit("Conv3d_2b_1x1")
    unit("Conv3d_2c_3x3")
    for name in MIXED_CHANNELS:
        unit(f"{name}/Branch_0/Conv3d_0a_1x1")
        unit(f"{name}/Branch_1/Conv3d_0a_1x1")
        unit(f"{name}/Branch_1/Conv3d_0b_3x3")
        unit(f"{name}/Branch_2/Conv3d_0a_1x1")
        unit(f"{name}/Branch_2/Conv3d_0b_3x3")
        unit(f"{name}/Branch_3/Conv3d_0b_1x1")
    unit("Logits/Conv3d_0c_1x1", bias=True)
    return keys


def random_params(seed: int = 0) -> Dict[str, np.ndarray]:
    """Random weights in the exact checkpoint layout (for loader tests)."""
    rng = np.random.RandomState(seed)
    shapes = _shape_table()
    out = {}
    for k in expected_keys():
        if k.endswith("moving_variance"):
            out[k] = rng.uniform(0.5, 1.5, shapes[k]).astype(np.float32)
        else:
            out[k] = rng.normal(0, 0.05, shapes[k]).astype(np.float32)
    return out


def _shape_table() -> Dict[str, tuple]:
    """Variable name -> shape, derived from the architecture."""
    out: Dict[str, tuple] = {}

    def unit(name, k, cin, cout, bias=False):
        out[f"{_SCOPE}/{name}/conv_3d/w"] = (*k, cin, cout)
        if bias:
            out[f"{_SCOPE}/{name}/conv_3d/b"] = (cout,)
        else:
            for s in ("beta", "moving_mean", "moving_variance"):
                out[f"{_SCOPE}/{name}/batch_norm/{s}"] = (1, 1, 1, 1, cout)

    unit("Conv3d_1a_7x7", (7, 7, 7), 3, 64)
    unit("Conv3d_2b_1x1", (1, 1, 1), 64, 64)
    unit("Conv3d_2c_3x3", (3, 3, 3), 64, 192)
    cin = 192
    for name, (b0, b1a, b1b, b2a, b2b, b3b) in MIXED_CHANNELS.items():
        unit(f"{name}/Branch_0/Conv3d_0a_1x1", (1, 1, 1), cin, b0)
        unit(f"{name}/Branch_1/Conv3d_0a_1x1", (1, 1, 1), cin, b1a)
        unit(f"{name}/Branch_1/Conv3d_0b_3x3", (3, 3, 3), b1a, b1b)
        unit(f"{name}/Branch_2/Conv3d_0a_1x1", (1, 1, 1), cin, b2a)
        unit(f"{name}/Branch_2/Conv3d_0b_3x3", (3, 3, 3), b2a, b2b)
        unit(f"{name}/Branch_3/Conv3d_0b_1x1", (1, 1, 1), cin, b3b)
        cin = b0 + b1b + b2b + b3b
    unit("Logits/Conv3d_0c_1x1", (1, 1, 1), cin, NUM_CLASSES, bias=True)
    return out


def load_params(path: str) -> Dict[str, np.ndarray]:
    """Load + validate an i3d weights npz (keys and shapes checked)."""
    with np.load(path) as data:
        params = {k: data[k] for k in data.files}
    shapes = _shape_table()
    missing = [k for k in expected_keys() if k not in params]
    if missing:
        raise ValueError(f"i3d weights file missing {len(missing)} keys, "
                         f"first: {missing[:3]}")
    for k, shape in shapes.items():
        got = tuple(params[k].shape)
        want = tuple(shape)
        if k.endswith(("beta", "moving_mean", "moving_variance", "/b")):
            if int(np.prod(got)) != int(np.prod(want)):
                raise ValueError(f"{k}: shape {got} != {want}")
        elif got != want:
            raise ValueError(f"{k}: shape {got} != {want}")
    return params


def default_weights_path() -> Optional[str]:
    env = os.environ.get("RFT_I3D_WEIGHTS")
    if env and os.path.exists(env):
        return env
    for cand in ("./data/i3d_kinetics400.npz", "./i3d_kinetics400.npz"):
        if os.path.exists(cand):
            return cand
    return None


def preprocess_videos(videos: jnp.ndarray) -> jnp.ndarray:
    """[B,T,H,W,C] in [0,1] -> [B,T,224,224,3] in [-1,1] (reference
    FVD.py bilinear resize + scaling)."""
    x = jnp.asarray(videos, jnp.float32)
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    b, t = x.shape[:2]
    x = jax.image.resize(x, (b, t, 224, 224, 3), method="bilinear")
    return x * 2.0 - 1.0


def i3d_embed(videos, params: Dict[str, np.ndarray]) -> np.ndarray:
    """Reference FVD embedding: [B,T,H,W,C] in [0,1] -> [B, 400] logits."""
    x = preprocess_videos(jnp.asarray(videos))
    return np.asarray(i3d_logits(params, x))
