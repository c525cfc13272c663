"""Dense (vector) LSTM stacks used by SVG.

Equivalent of reference SVG/SVG.py:122-190 (lstm_svg / gaussian_lstm):
embed -> n stacked LSTM cells -> head. State is carried explicitly as a
pytree (the reference stores it on the module), so the stacks scan cleanly
over time under jit.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class DenseLSTMCell(nn.Module):
    """Plain LSTM cell: gates (i, f, g, o) from one fused Dense([x; h])."""

    hidden: int

    @nn.compact
    def __call__(self, x, state):
        h, c = state
        gates = nn.Dense(4 * self.hidden, name="gates")(jnp.concatenate([x, h], -1))
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return h, (h, c)


class SVGLSTM(nn.Module):
    """embed -> n_layers LSTM -> Dense+tanh (reference lstm_svg)."""

    output_size: int
    hidden: int
    n_layers: int

    def setup(self):
        self.embed = nn.Dense(self.hidden, name="embed")
        self.cells = tuple(
            DenseLSTMCell(self.hidden, name=f"cell{i}") for i in range(self.n_layers)
        )
        self.out = nn.Dense(self.output_size, name="out")

    def init_state(self, batch: int):
        z = jnp.zeros((batch, self.hidden))
        return tuple((z, z) for _ in range(self.n_layers))

    def __call__(self, x, state):
        h_in = self.embed(x)
        new_state = []
        for cell, s in zip(self.cells, state):
            h_in, s2 = cell(h_in, s)
            new_state.append(s2)
        return jnp.tanh(self.out(h_in)), tuple(new_state)


class SVGGaussianLSTM(nn.Module):
    """embed -> n_layers LSTM -> (mu, softplus std) + reparameterized z.

    Reference gaussian_lstm (SVG/SVG.py:154-190). NOTE deviation: the
    reference emits softplus(std) but then reparameterizes/KLs it as if it
    were a log-variance (:176-179, :266-271) — a units inconsistency. Here
    std is used consistently as a standard deviation.
    """

    output_size: int
    hidden: int
    n_layers: int

    def setup(self):
        self.embed = nn.Dense(self.hidden, name="embed")
        self.cells = tuple(
            DenseLSTMCell(self.hidden, name=f"cell{i}") for i in range(self.n_layers)
        )
        self.mu_net = nn.Dense(self.output_size, name="mu")
        self.std_net = nn.Dense(self.output_size, name="std")

    def init_state(self, batch: int):
        z = jnp.zeros((batch, self.hidden))
        return tuple((z, z) for _ in range(self.n_layers))

    def __call__(self, x, state, rng):
        h_in = self.embed(x)
        new_state = []
        for cell, s in zip(self.cells, state):
            h_in, s2 = cell(h_in, s)
            new_state.append(s2)
        mu = self.mu_net(h_in)
        std = jax.nn.softplus(self.std_net(h_in))
        z = mu + std * jax.random.normal(rng, mu.shape, mu.dtype)
        return z, mu, std, tuple(new_state)
