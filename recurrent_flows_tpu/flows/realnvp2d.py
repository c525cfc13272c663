"""Low-dimensional flows: RealNVP, conditional RealNVP, CDF/autoregressive.

Capability parity with Notebooks/TwoMoonFlows.ipynb (SURVEY §2.10): masked
affine couplings with exact inverses on 2-D data, a context-conditioned
variant (rotating two-moons), and 1-D mixture-CDF flows composed
autoregressively. Pure linen + jnp; runs fine on CPU.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def _std_normal_logprob(z):
    return jnp.sum(-0.5 * z ** 2 - _LOG_SQRT_2PI, axis=-1)


class MaskedAffineCoupling(nn.Module):
    """y = mask*x + (1-mask)*(x*exp(s) + t), (s, t) = MLP(mask*x [, ctx])."""

    dim: int
    mask: Tuple[float, ...]
    hidden: int = 64
    context_dim: int = 0

    @nn.compact
    def __call__(self, x, context=None, reverse: bool = False):
        mask = jnp.asarray(self.mask)
        h = x * mask
        if self.context_dim:
            h = jnp.concatenate([h, context], axis=-1)
        for i in range(2):
            h = jnp.tanh(nn.Dense(self.hidden, name=f"fc{i}")(h))
        st = nn.Dense(2 * self.dim, name="out",
                      kernel_init=nn.initializers.zeros)(h)
        s, t = jnp.split(st, 2, axis=-1)
        s = jnp.tanh(s)  # stability clamp
        s = s * (1 - mask)
        t = t * (1 - mask)
        if not reverse:
            y = x * jnp.exp(s) + t
            return y, jnp.sum(s, axis=-1)
        else:
            y = (x - t) * jnp.exp(-s)
            return y, -jnp.sum(s, axis=-1)


class RealNVP2D(nn.Module):
    """Stack of alternating-mask couplings; standard-normal base."""

    dim: int = 2
    n_couplings: int = 6
    hidden: int = 64
    context_dim: int = 0  # >0 => conditional RealNVP

    def setup(self):
        masks = []
        for i in range(self.n_couplings):
            m = [(1.0 if (j + i) % 2 == 0 else 0.0) for j in range(self.dim)]
            masks.append(tuple(m))
        self.couplings = tuple(
            MaskedAffineCoupling(self.dim, masks[i], self.hidden, self.context_dim,
                                 name=f"cpl{i}")
            for i in range(self.n_couplings)
        )

    def f(self, x, context=None):
        logdet = jnp.zeros(x.shape[0])
        for c in self.couplings:
            x, ld = c(x, context)
            logdet = logdet + ld
        return x, logdet

    def g(self, z, context=None):
        for c in reversed(self.couplings):
            z, _ = c(z, context, reverse=True)
        return z

    def log_prob(self, x, context=None):
        z, logdet = self.f(x, context)
        return _std_normal_logprob(z) + logdet

    def sample(self, rng, n: int, context=None):
        z = jax.random.normal(rng, (n, self.dim))
        return self.g(z, context)

    def __call__(self, x, context=None):
        return self.log_prob(x, context)


class MixtureCDFFlow(nn.Module):
    """1-D monotone flow x -> CDF of a K-gaussian mixture (notebook cell 4).

    Maps to (0,1); logdet = log mixture pdf. Inverse via bisection.
    """

    n_components: int = 5

    @nn.compact
    def __call__(self, x, reverse: bool = False):
        k = self.n_components
        logits = self.param("logits", nn.initializers.zeros, (k,))
        means = self.param(
            "means", lambda key, s: jnp.linspace(-2.0, 2.0, k), (k,)
        )
        log_scales = self.param("log_scales", nn.initializers.zeros, (k,))
        w = jax.nn.softmax(logits)
        scales = jnp.exp(log_scales)

        def cdf(v):
            zs = (v[..., None] - means) / scales
            return jnp.sum(w * jax.nn.sigmoid(1.702 * zs), axis=-1)

        def logpdf(v):
            zs = (v[..., None] - means) / scales
            comp = -0.5 * zs ** 2 - log_scales - _LOG_SQRT_2PI
            return jax.scipy.special.logsumexp(jnp.log(w) + comp, axis=-1)

        if not reverse:
            return cdf(x), logpdf(x)
        # bisection inverse on a generous bracket
        lo = jnp.full_like(x, -30.0)
        hi = jnp.full_like(x, 30.0)

        def body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            too_low = cdf(mid) < x
            return jnp.where(too_low, mid, lo), jnp.where(too_low, hi, mid)

        lo, hi = jax.lax.fori_loop(0, 60, body, (lo, hi))
        return 0.5 * (lo + hi), None


class AutoregFlow2D(nn.Module):
    """2-D autoregressive CDF flow: z1 = F1(x1), z2 = F2(x2 | x1) (cell 7).

    The conditional CDF's mixture params come from an MLP over x1.
    """

    n_components: int = 5
    hidden: int = 32

    def setup(self):
        self.f1 = MixtureCDFFlow(self.n_components, name="f1")
        self.net = nn.Sequential(
            [nn.Dense(self.hidden), jnp.tanh, nn.Dense(3 * self.n_components)]
        )

    def _cond_params(self, x1):
        p = self.net(x1[..., None])
        logits, means, log_scales = jnp.split(p, 3, axis=-1)
        return jax.nn.softmax(logits), means, jnp.exp(jnp.clip(log_scales, -5, 5)), \
            jnp.clip(log_scales, -5, 5)

    def log_prob(self, x):
        x1, x2 = x[..., 0], x[..., 1]
        _, lp1 = self.f1(x1)
        w, means, scales, log_scales = self._cond_params(x1)
        zs = (x2[..., None] - means) / scales
        comp = -0.5 * zs ** 2 - log_scales - _LOG_SQRT_2PI
        lp2 = jax.scipy.special.logsumexp(jnp.log(w) + comp, axis=-1)
        return lp1 + lp2

    def __call__(self, x):
        return self.log_prob(x)
