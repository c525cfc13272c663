"""VRNN — classic variational RNN (dense latents), TPU-native.

Capability-parity rebuild of reference VRNN/VRNN.py:11-428: ConvLSTM input
[phi_x(x_{t-1}); phi_z(z_{t-1})], prior p(z_t|h_t), encoder
q(z_t|h_t, phi_x(x_t)), deconv decoder with the 4 likelihoods, plus
predict/reconstruct/sample and the importance-weighted ELBO.

Unlike SRNN, the recurrence consumes the previous posterior sample, so the
whole loss is a single lax.scan carrying (h, c, zx_prev); frame features
are still precomputed in one batched phi_x call.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import VRNNConfig
from ..nn.convlstm import ConvLSTMCell
from ..utils.numerics import batch_reduce, normal_kl, normal_log_prob, normal_sample
from .dense_latent import ConvMLPGaussian, FrameDecoder, LikelihoodHead, PhiX, PhiZ


class VRNN(nn.Module):
    cfg: VRNNConfig
    remat: bool = True
    # torch model.eval() equivalent (instance-global): normalize with
    # running-average batch stats; requires cfg.track_running_stats.
    eval_norm: bool = False

    def setup(self):
        cfg = self.cfg
        h = cfg.image_size // 8
        self._ura = bool(self.eval_norm and cfg.track_running_stats)
        trs = cfg.track_running_stats
        self.phi_x = PhiX(cfg.norm_type, track_running_stats=trs, name="phi_x")
        self.phi_z = PhiZ(h, h, 128, cfg.norm_type, track_running_stats=trs, name="phi_z")
        self.enc = ConvMLPGaussian(cfg.z_dim, cfg.norm_type, track_running_stats=trs, name="enc")
        self.prior = ConvMLPGaussian(cfg.z_dim, cfg.norm_type, track_running_stats=trs, name="prior")
        self.dec = FrameDecoder(cfg.norm_type, track_running_stats=trs, name="dec")
        self.head = LikelihoodHead(
            cfg.x_channels,
            loss_type=cfg.loss_type,
            preprocess_range=cfg.preprocess_range,
            n_logistics=cfg.n_logistics,
            n_bits=cfg.n_bits,
            dequantize=cfg.dequantize,
            name="head",
        )
        self.lstm = ConvLSTMCell(cfg.h_dim, name="lstm")
        z = nn.initializers.zeros
        self.h_0 = self.param("h_0", z, (1, h, h, cfg.h_dim))
        self.c_0 = self.param("c_0", z, (1, h, h, cfg.h_dim))
        self.z_0 = self.param("z_0", z, (1, cfg.z_dim))
        self.z_0x = self.param("z_0x", z, (1, cfg.z_dim))

    def stats_refresh(self, x, rng):
        """Out-of-scan forward refreshing batchnorm running stats (apply
        with mutable=['batch_stats']; Trainer.refresh_stats drives this).
        Requires cfg.track_running_stats."""
        return self.__call__(x, rng)

    def _phi_x_n(self, x):
        return self.phi_x(x, self._ura)

    def _phi_z_n(self, z):
        return self.phi_z(z, self._ura)

    def _enc_n(self, x):
        return self.enc(x, self._ura)

    def _prior_n(self, x):
        return self.prior(x, self._ura)

    def _dec_n(self, x):
        return self.dec(x, self._ura)

    def get_inits(self, batch: int):
        rep = lambda p: jnp.broadcast_to(p, (batch,) + p.shape[1:])
        return rep(self.h_0), rep(self.c_0), rep(self.z_0), rep(self.z_0x)

    def _features(self, x):
        b, t = x.shape[:2]
        flat = self._phi_x_n(x.reshape((b * t,) + x.shape[2:]))
        return flat.reshape((b, t) + flat.shape[1:]).swapaxes(0, 1)

    def __call__(self, x, rng):
        b = x.shape[0]
        feats = self._features(x[:, :2])
        h0, c0, z0, z0x = self.get_inits(b)
        lstm_in = jnp.concatenate([feats[0], self._phi_z_n(z0x)], -1)
        ht, _ = self.lstm(lstm_in, h0, c0)
        pm, ps = self._prior_n(ht)
        em, es = self._enc_n(jnp.concatenate([ht, feats[1]], -1))
        dec = self._dec_n(jnp.concatenate([ht, self._phi_z_n(em)], -1))
        nll = self.head.nll(dec, x[:, 1], rng)
        _ = self.head.decode(dec, rng)
        return nll

    # ------------------------------------------------------------------
    def loss(self, x, rng):
        b, t = x.shape[:2]
        feats = self._features(x)
        h0, c0, _, z0x = self.get_inits(b)
        x_tm = x.swapaxes(0, 1)
        keys = jax.random.split(rng, t - 1)

        def step(carry, xs):
            h, c, zxprev = carry
            x_t, feat_prev, feat_t, key = xs
            lstm_in = jnp.concatenate([feat_prev, self._phi_z_n(zxprev)], -1)
            h, c = self.lstm(lstm_in, h, c)
            pm, ps = self._prior_n(h)
            em, es = self._enc_n(jnp.concatenate([h, feat_t], -1))
            k1, k2 = jax.random.split(key)
            zx_t = normal_sample(k1, em, es)
            dec = self._dec_n(jnp.concatenate([h, self._phi_z_n(zx_t)], -1))
            nll = self.head.nll(dec, x_t, k2)
            kl = normal_kl(em, es, pm, ps)
            return (h, c, zx_t), dict(kl=kl, nll=nll)

        step_fn = jax.checkpoint(step) if self.remat else step
        _, outs = jax.lax.scan(
            step_fn, (h0, c0, z0x), (x_tm[1:], feats[:-1], feats[1:], keys)
        )
        kl_loss = jnp.sum(outs["kl"], axis=0)
        nll_loss = jnp.sum(outs["nll"], axis=0)
        return dict(
            kl_free_bits=jnp.mean(batch_reduce(kl_loss)),
            kl=jnp.mean(batch_reduce(kl_loss)),
            nll=jnp.mean(nll_loss),
        )

    # ------------------------------------------------------------------
    def predict(self, x, n_predictions: int, n_conditions: int, rng):
        """Warmup advances the posterior-driven LSTM but the rollout
        continues the PRIOR latent chain (reference VRNN.py:255-306)."""
        b = x.shape[0]
        feats = self._features(x[:, :n_conditions])
        h0, c0, z0, z0x = self.get_inits(b)
        kw, kr = jax.random.split(rng)

        def warm(carry, xs):
            h, c, zprev, zxprev = carry
            feat_prev, feat_t, key = xs
            lstm_in = jnp.concatenate([feat_prev, self._phi_z_n(zxprev)], -1)
            h, c = self.lstm(lstm_in, h, c)
            k1, k2 = jax.random.split(key)
            pm, ps = self._prior_n(h)
            z_t = normal_sample(k1, pm, ps)
            em, es = self._enc_n(jnp.concatenate([h, feat_t], -1))
            zx_t = normal_sample(k2, em, es)
            return (h, c, z_t, zx_t), None

        (h, c, zprev, _), _ = jax.lax.scan(
            warm, (h0, c0, z0, z0x),
            (feats[:-1], feats[1:], jax.random.split(kw, n_conditions - 1)),
        )
        prediction = x[:, n_conditions - 1]

        def step(carry, key):
            h, c, zprev, pred = carry
            ut = self._phi_x_n(pred)
            lstm_in = jnp.concatenate([ut, self._phi_z_n(zprev)], -1)
            h, c = self.lstm(lstm_in, h, c)
            pm, ps = self._prior_n(h)
            k1, k2 = jax.random.split(key)
            z_t = normal_sample(k1, pm, ps)
            dec = self._dec_n(jnp.concatenate([h, self._phi_z_n(z_t)], -1))
            new_pred = self.head.decode(dec, k2)
            return (h, c, z_t, new_pred), new_pred

        _, preds = jax.lax.scan(
            step, (h, c, zprev, prediction), jax.random.split(kr, n_predictions)
        )
        return x[:, :n_conditions].swapaxes(0, 1), preds

    def reconstruct(self, x, rng):
        b, t = x.shape[:2]
        feats = self._features(x)
        h0, c0, _, z0x = self.get_inits(b)
        keys = jax.random.split(rng, t - 1)

        def step(carry, xs):
            h, c, zxprev = carry
            feat_prev, feat_t, key = xs
            lstm_in = jnp.concatenate([feat_prev, self._phi_z_n(zxprev)], -1)
            h, c = self.lstm(lstm_in, h, c)
            em, es = self._enc_n(jnp.concatenate([h, feat_t], -1))
            k1, k2 = jax.random.split(key)
            zx_t = normal_sample(k1, em, es)
            dec = self._dec_n(jnp.concatenate([h, self._phi_z_n(zx_t)], -1))
            return (h, c, zx_t), self.head.decode(dec, k2)

        _, recons = jax.lax.scan(step, (h0, c0, z0x), (feats[:-1], feats[1:], keys))
        return recons

    def sample(self, x, n_samples: int, rng):
        b = x.shape[0]
        h, c, zprev, _ = self.get_inits(b)

        def step(carry, key):
            h, c, zprev, frame = carry
            ut = self._phi_x_n(frame)
            lstm_in = jnp.concatenate([ut, self._phi_z_n(zprev)], -1)
            h, c = self.lstm(lstm_in, h, c)
            pm, ps = self._prior_n(h)
            k1, k2 = jax.random.split(key)
            z_t = normal_sample(k1, pm, ps)
            dec = self._dec_n(jnp.concatenate([h, self._phi_z_n(z_t)], -1))
            s = self.head.decode(dec, k2)
            return (h, c, z_t, s), s

        _, samples = jax.lax.scan(
            step, (h, c, zprev, x[:, 0]), jax.random.split(rng, n_samples)
        )
        return samples

    def elbo_importance_weighting(self, x, K: int, rng):
        """K-sample IW-ELBO (reference VRNN.py:366-428; corrected bound)."""
        b, t = x.shape[:2]
        feats = self._features(x)
        h0, c0, _, z0x = self.get_inits(b)
        x_tm = x.swapaxes(0, 1)
        keys = jax.random.split(rng, t - 1)

        def step(carry, xs):
            h, c, zxprev = carry
            x_t, feat_prev, feat_t, key = xs
            lstm_in = jnp.concatenate([feat_prev, self._phi_z_n(zxprev)], -1)
            h, c = self.lstm(lstm_in, h, c)
            pm, ps = self._prior_n(h)
            em, es = self._enc_n(jnp.concatenate([h, feat_t], -1))

            def one_sample(k):
                k1, k2 = jax.random.split(k)
                zx = normal_sample(k1, em, es)
                dec = self._dec_n(jnp.concatenate([h, self._phi_z_n(zx)], -1))
                lpx = -self.head.nll(dec, x_t, k2)
                lpz = jnp.sum(normal_log_prob(zx, pm, ps), -1)
                lqzx = jnp.sum(normal_log_prob(zx, em, es), -1)
                return lpx + lpz - lqzx, zx

            ws, zs = jax.vmap(one_sample)(jax.random.split(key, K))
            iw = jax.scipy.special.logsumexp(ws, axis=0) - jnp.log(float(K))
            return (h, c, zs[0]), iw

        _, iws = jax.lax.scan(step, (h0, c0, z0x), (x_tm[1:], feats[:-1], feats[1:], keys))
        return -jnp.mean(jnp.sum(iws, axis=0))
