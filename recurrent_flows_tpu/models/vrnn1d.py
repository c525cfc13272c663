"""VRNN-1D — dense variational RNN on scalar sequences (sinusoids).

Capability parity with the reference's VRNN1D notebook workload
(Notebooks listed in .MISSING_LARGE_BLOBS; generator `SinusWithNoise` in
data_sets.ipynb — SURVEY §2.10): classic VRNN with Dense feature nets and
a gaussian observation model, trained on noisy sinusoid sequences
[B, T, 1].
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.dense_lstm import DenseLSTMCell
from ..utils.numerics import batch_reduce, normal_kl, normal_log_prob, normal_sample


class _GaussianHead(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        h = jax.nn.relu(nn.Dense(self.hidden, name="fc0")(x))
        mean = nn.Dense(self.out, name="mean")(h)
        std = jax.nn.softplus(nn.Dense(self.out, name="std")(h))
        return mean, std


class _MLP(nn.Module):
    sizes: tuple

    @nn.compact
    def __call__(self, x):
        for i, s in enumerate(self.sizes):
            x = jax.nn.relu(nn.Dense(s, name=f"fc{i}")(x))
        return x


class VRNN1D(nn.Module):
    h_dim: int = 64
    z_dim: int = 8
    feat_dim: int = 32
    remat: bool = False

    def setup(self):
        self.cell = DenseLSTMCell(self.h_dim, name="lstm")
        self.phi_x = _MLP((self.feat_dim, self.feat_dim), name="phi_x")
        self.phi_z = _MLP((self.feat_dim,), name="phi_z")
        self.prior_head = _GaussianHead(self.h_dim, self.z_dim, name="prior")
        self.enc_head = _GaussianHead(self.h_dim, self.z_dim, name="enc")
        self.dec_head = _GaussianHead(self.h_dim, 1, name="dec")
        z = nn.initializers.zeros
        self.h_0 = self.param("h_0", z, (1, self.h_dim))
        self.c_0 = self.param("c_0", z, (1, self.h_dim))
        self.z_0x = self.param("z_0x", z, (1, self.z_dim))

    def _inits(self, b):
        return (
            jnp.broadcast_to(self.h_0, (b, self.h_dim)),
            jnp.broadcast_to(self.c_0, (b, self.h_dim)),
            jnp.broadcast_to(self.z_0x, (b, self.z_dim)),
        )

    def _advance(self, h, c, x_prev, zxprev):
        inp = jnp.concatenate([self.phi_x(x_prev), self.phi_z(zxprev)], -1)
        _, (h, c) = self.cell(inp, (h, c))
        return h, c

    def __call__(self, x, rng):
        """Init-only: one unscanned step."""
        b = x.shape[0]
        h, c, z0x = self._inits(b)
        h, c = self._advance(h, c, x[:, 0], z0x)
        pm, ps = self.prior_head(h)
        em, es = self.enc_head(jnp.concatenate([h, self.phi_x(x[:, 1])], -1))
        dm, ds = self.dec_head(jnp.concatenate([h, self.phi_z(em)], -1))
        return jnp.mean(dm) + jnp.mean(pm) + jnp.mean(ps)

    def loss(self, x, rng):
        """x: [B, T, 1]; returns the standard {kl_free_bits, kl, nll} dict."""
        b, t = x.shape[:2]
        h, c, z0x = self._inits(b)
        keys = jax.random.split(rng, t - 1)
        x_tm = x.swapaxes(0, 1)

        def step(carry, xs):
            h, c, zxprev = carry
            x_prev, x_t, key = xs
            h, c = self._advance(h, c, x_prev, zxprev)
            pm, ps = self.prior_head(h)
            em, es = self.enc_head(jnp.concatenate([h, self.phi_x(x_t)], -1))
            zx = normal_sample(key, em, es)
            dm, ds = self.dec_head(jnp.concatenate([h, self.phi_z(zx)], -1))
            nll = -batch_reduce(normal_log_prob(x_t, dm, ds + 1e-4))
            kl = normal_kl(em, es, pm, ps)
            return (h, c, zx), dict(nll=nll, kl=kl)

        _, outs = jax.lax.scan(step, (h, c, z0x), (x_tm[:-1], x_tm[1:], keys))
        kl_loss = jnp.sum(outs["kl"], axis=0)
        nll_loss = jnp.sum(outs["nll"], axis=0)
        return dict(
            kl_free_bits=jnp.mean(batch_reduce(kl_loss)),
            kl=jnp.mean(batch_reduce(kl_loss)),
            nll=jnp.mean(nll_loss),
        )

    def predict(self, x, n_predictions: int, n_conditions: int, rng):
        """Warm up on conditioning steps, then free-run the prior."""
        b = x.shape[0]
        h, c, zx = self._inits(b)
        kw, kr = jax.random.split(rng)
        x_tm = x[:, :n_conditions].swapaxes(0, 1)

        def warm(carry, xs):
            h, c, zx = carry
            x_prev, x_t, key = xs
            h, c = self._advance(h, c, x_prev, zx)
            em, es = self.enc_head(jnp.concatenate([h, self.phi_x(x_t)], -1))
            return (h, c, normal_sample(key, em, es)), None

        (h, c, zx), _ = jax.lax.scan(
            warm, (h, c, zx),
            (x_tm[:-1], x_tm[1:], jax.random.split(kw, n_conditions - 1)),
        )
        pred = x[:, n_conditions - 1]

        def step(carry, key):
            h, c, zprev, pred = carry
            h, c = self._advance(h, c, pred, zprev)
            pm, ps = self.prior_head(h)
            z = normal_sample(key, pm, ps)
            dm, _ = self.dec_head(jnp.concatenate([h, self.phi_z(z)], -1))
            return (h, c, z, dm), dm

        _, preds = jax.lax.scan(
            step, (h, c, zx, pred), jax.random.split(kr, n_predictions)
        )
        return x[:, :n_conditions].swapaxes(0, 1), preds
