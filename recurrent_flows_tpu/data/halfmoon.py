"""Rotating two-moons conditional sampler (pure JAX, no sklearn).

Reference data_generators/halfmoon.py:8-80: two-moons samples rotated by a
random angle theta ~ U(0, 2pi) used as the conditioning covariate for the
conditional RealNVP notebook workloads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def two_moons(key, n: int, noise: float = 0.05):
    """Standard two-moons: outer arc + shifted inner arc, gaussian noise."""
    k1, k2, k3 = jax.random.split(key, 3)
    n_out = n // 2
    n_in = n - n_out
    t_out = jax.random.uniform(k1, (n_out,), maxval=jnp.pi)
    t_in = jax.random.uniform(k2, (n_in,), maxval=jnp.pi)
    outer = jnp.stack([jnp.cos(t_out), jnp.sin(t_out)], axis=-1)
    inner = jnp.stack([1.0 - jnp.cos(t_in), 0.5 - jnp.sin(t_in)], axis=-1)
    x = jnp.concatenate([outer, inner], axis=0)
    x = x + noise * jax.random.normal(k3, x.shape)
    # center like sklearn's make_moons usage in the reference notebooks
    return x - jnp.array([0.5, 0.25])


def _rotate(x, theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])
    return x @ rot.T


class RotatingTwoMoonsConditionalSampler:
    """conditioned_sample(key, n, theta) / joint_sample(key, n).

    Reference halfmoon.py:14-37.
    """

    def __init__(self, noise: float = 0.05):
        self.noise = noise

    def conditioned_sample(self, key, n: int, theta):
        x = two_moons(key, n, self.noise)
        return _rotate(x, jnp.asarray(theta))

    def joint_sample(self, key, n: int):
        k1, k2 = jax.random.split(key)
        theta = jax.random.uniform(k1, (), maxval=2.0 * jnp.pi)
        return self.conditioned_sample(k2, n, theta), theta

    def loader(self, key, batch_size: int, n_batches: int):
        """Iterator of (x [B,2], theta [B,1]) pairs — each row its own angle."""
        for i in range(n_batches):
            k = jax.random.fold_in(key, i)
            ks = jax.random.split(k, batch_size)
            thetas = jax.random.uniform(k, (batch_size,), maxval=2.0 * jnp.pi)
            xs = jax.vmap(lambda kk, th: self.conditioned_sample(kk, 1, th)[0])(
                ks, thetas
            )
            yield xs, thetas[:, None]
