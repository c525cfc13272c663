"""Noisy sinusoid sequence generator (the "VRNN-1D" workload).

Reference: `SinusWithNoise` in Notebooks/data_sets.ipynb (SURVEY §2.8):
phase-randomized sinusoids with gaussian observation noise, shaped
[timeblocks, seq_len].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("seq_len", "batch_size"))
def sample_sinusoids(key, *, seq_len: int = 100, batch_size: int = 32,
                     freq: float = 0.06, noise: float = 0.1):
    """Returns [B, T, 1]: sin(2*pi*f*t + phi) + eps, phi ~ U(0, 2pi)."""
    k1, k2, k3 = jax.random.split(key, 3)
    phase = jax.random.uniform(k1, (batch_size, 1), maxval=2 * jnp.pi)
    f = freq * (1.0 + 0.5 * jax.random.uniform(k2, (batch_size, 1)))
    t = jnp.arange(seq_len, dtype=jnp.float32)[None, :]
    x = jnp.sin(2 * jnp.pi * f * t + phase)
    x = x + noise * jax.random.normal(k3, x.shape)
    return x[..., None]


class SinusWithNoise:
    def __init__(self, seq_len: int = 100, freq: float = 0.06, noise: float = 0.1):
        self.seq_len = seq_len
        self.freq = freq
        self.noise = noise

    def sample(self, key, batch_size: int):
        return sample_sinusoids(
            key, seq_len=self.seq_len, batch_size=batch_size, freq=self.freq,
            noise=self.noise,
        )
