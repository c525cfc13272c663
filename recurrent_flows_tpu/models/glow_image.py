"""Standalone image-density Glow models.

Two capabilities from the reference outside the video models:
  * unconditional Glow on images (SURVEY §7 step 2 validation workload /
    the stripped Glow.ipynb) — ListGlow driven with learned constant
    per-scale conditions and base condition;
  * conditional Glow (cGlow, Notebooks/cGlow.ipynb) — p(inner | outer) on
    boxed CelebA: a small conv encoder of the context image produces the
    per-scale conditions and the base condition.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..config import GlowConfig
from ..nn.layers import NormLayer, act, conv2d
from ..flows.glow import ListGlow


class GlowImage(nn.Module):
    """Unconditional Glow: learned constant conditions per scale."""

    in_channels: int
    image_size: int
    cfg: GlowConfig
    cond_channels: int = 8
    base_channels: int = 8

    def setup(self):
        cfg = self.cfg
        self.flow = ListGlow(self.in_channels, self.image_size, cfg, name="flow")
        hw = self.image_size
        conds = []
        for l in range(cfg.L):
            hw //= 2
            conds.append(
                self.param(f"cond_{l}", nn.initializers.zeros,
                           (1, hw, hw, self.cond_channels))
            )
        self.conds = conds
        self.base = self.param(
            "base", nn.initializers.zeros, (1, hw, hw, self.base_channels)
        )

    def _broadcast(self, batch):
        conds = [jnp.broadcast_to(c, (batch,) + c.shape[1:]) for c in self.conds]
        base = jnp.broadcast_to(self.base, (batch,) + self.base.shape[1:])
        return conds, base

    def __call__(self, x, rng):
        if x.ndim == 5:  # video batches: frames treated i.i.d.
            x = x.reshape((-1,) + x.shape[2:])
        conds, base = self._broadcast(x.shape[0])
        _, nll = self.flow.log_prob(x, conds, base, rng)
        return nll

    def ddi(self, x, rng):
        if x.ndim == 5:
            x = x.reshape((-1,) + x.shape[2:])
        conds, base = self._broadcast(x.shape[0])
        _, nll = self.flow.log_prob(x, conds, base, rng, ddi=True)
        return nll

    def loss(self, x, rng):
        """x: [B,H,W,C] or [B,T,H,W,C] (frames treated i.i.d.)."""
        if x.ndim == 5:
            x = x.reshape((-1,) + x.shape[2:])
        nll = self(x, rng)
        zero = jnp.zeros(())
        return dict(kl_free_bits=zero, kl=zero, nll=jnp.mean(nll))

    def sample(self, n: int, rng, temperature: float = 0.8):
        conds, base = self._broadcast(n)
        return self.flow.sample(None, conds, base, rng, temperature=temperature)


class ConditionalGlowImage(nn.Module):
    """cGlow: conditions come from a conv encoder of a context image."""

    in_channels: int
    image_size: int
    cfg: GlowConfig
    cond_channels: int = 32
    norm_type: str = "none"

    def setup(self):
        cfg = self.cfg
        self.flow = ListGlow(self.in_channels, self.image_size, cfg, name="flow")
        self.enc_convs = tuple(
            conv2d(self.cond_channels, 3, stride=2, name=f"enc{l}")
            for l in range(cfg.L)
        )
        self.enc_norms = tuple(
            NormLayer(self.norm_type, name=f"encn{l}") for l in range(cfg.L)
        )

    def _conditions(self, context):
        """Context pyramid: one stride-2 conv per flow scale."""
        conds = []
        h = context
        for conv, norm in zip(self.enc_convs, self.enc_norms):
            h = act(norm(conv(h)), "relu")
            conds.append(h)
        return conds, conds[-1]

    def __call__(self, x, context, rng):
        conds, base = self._conditions(context)
        _, nll = self.flow.log_prob(x, conds, base, rng)
        return nll

    def ddi(self, x, context, rng):
        conds, base = self._conditions(context)
        _, nll = self.flow.log_prob(x, conds, base, rng, ddi=True)
        return nll

    def log_prob(self, x, context, rng):
        return self(x, context, rng)

    def sample(self, context, rng, temperature: float = 0.8):
        conds, base = self._conditions(context)
        return self.flow.sample(None, conds, base, rng, temperature=temperature)
