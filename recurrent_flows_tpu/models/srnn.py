"""SRNN — stochastic RNN with ConvLSTM backbone and dense latents.

Capability-parity rebuild of reference SRNN/SRNN.py:11-579: deterministic
ConvLSTM over frame features, optional backward smoothing LSTM, vector
latents lifted to spatial maps, residual posterior, latent overshooting,
4 likelihoods (bernoulli / gaussian+dequant / mse / MoL), and an
importance-weighted ELBO for evaluation.

TPU-first: batched phi_x over B*T, lax.scan unrolls, vectorized
overshooting, vmapped K-sample IW-ELBO (the reference loops K times per
step in python, :511-576).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import SRNNConfig
from ..nn.convlstm import ConvLSTMCell, conv_lstm_scan
from ..utils.numerics import batch_reduce, normal_kl, normal_log_prob, normal_sample
from .dense_latent import ConvMLPGaussian, FrameDecoder, LikelihoodHead, PhiX, PhiZ


class SRNN(nn.Module):
    cfg: SRNNConfig
    remat: bool = True
    # torch model.eval() equivalent (instance-global): normalize with
    # running-average batch stats; requires cfg.track_running_stats.
    eval_norm: bool = False

    def setup(self):
        cfg = self.cfg
        h = cfg.image_size // 8
        self._hw = h
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
        self.lstm_h = ConvLSTMCell(cfg.h_dim, name="lstm_h")
        if cfg.enable_smoothing:
            self.lstm_a = ConvLSTMCell(cfg.a_dim, name="lstm_a")
        z = nn.initializers.zeros
        self.h_0 = self.param("h_0", z, (1, h, h, cfg.h_dim))
        self.c_0 = self.param("c_0", z, (1, h, h, cfg.h_dim))
        self.a_0 = self.param("a_0", z, (1, h, h, cfg.a_dim))
        self.ca_0 = self.param("ca_0", z, (1, h, h, cfg.a_dim))
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
        return (rep(self.h_0), rep(self.c_0), rep(self.a_0), rep(self.ca_0),
                rep(self.z_0), rep(self.z_0x))

    def _features(self, x):
        b, t = x.shape[:2]
        flat = self._phi_x_n(x.reshape((b * t,) + x.shape[2:]))
        return flat.reshape((b, t) + flat.shape[1:]).swapaxes(0, 1)

    # ------------------------------------------------------------------
    def __call__(self, x, rng):
        """Init-only: touch every submodule once (no scans)."""
        cfg = self.cfg
        b = x.shape[0]
        feats = self._features(x[:, :2])
        h0, c0, a0, ca0, z0, z0x = self.get_inits(b)
        ht, _ = self.lstm_h(feats[0], h0, c0)
        if cfg.enable_smoothing:
            at, _ = self.lstm_a(jnp.concatenate([ht, feats[1]], -1), a0, ca0)
            enc_in = jnp.concatenate([at, self._phi_z_n(z0x)], -1)
        else:
            enc_in = jnp.concatenate([ht, self._phi_z_n(z0x), feats[1]], -1)
        enc_mean, enc_std = self._enc_n(enc_in)
        prior_mean, prior_std = self._prior_n(
            jnp.concatenate([ht, self._phi_z_n(z0)], -1)
        )
        dec = self._dec_n(jnp.concatenate([ht, self._phi_z_n(enc_mean)], -1))
        nll = self.head.nll(dec, x[:, 1], rng)
        _ = self.head.decode(dec, rng)
        return nll

    # ------------------------------------------------------------------
    def _prior_params(self, ht, z):
        return self._prior_n(jnp.concatenate([ht, self._phi_z_n(z)], -1))

    def loss(self, x, rng):
        cfg = self.cfg
        b, t = x.shape[:2]
        feats = self._features(x)
        h0, c0, a0, ca0, z0, z0x = self.get_inits(b)
        hs, _, _ = conv_lstm_scan(self.lstm_h, feats[:-1], h0, c0)
        if cfg.enable_smoothing:
            a_in = jnp.concatenate([hs, feats[1:]], -1)
            as_, _, _ = conv_lstm_scan(self.lstm_a, a_in, a0, ca0, reverse=True)
        else:
            as_ = jnp.zeros((t - 1, b, 1, 1, 1))
        x_tm = x.swapaxes(0, 1)
        keys = jax.random.split(rng, t - 1)

        def step(carry, xs):
            zprev, zxprev = carry
            x_t, ht, at, feat_t, key = xs
            if cfg.enable_smoothing:
                enc_in = jnp.concatenate([at, self._phi_z_n(zxprev)], -1)
            else:
                enc_in = jnp.concatenate([ht, self._phi_z_n(zxprev), feat_t], -1)
            enc_mean, enc_std = self._enc_n(enc_in)
            if cfg.res_q:
                prior_mean, prior_std = self._prior_params(ht, zxprev)
                enc_mean = prior_mean + enc_mean
            else:
                prior_mean, prior_std = self._prior_params(ht, zprev)
            k1, k2, k3 = jax.random.split(key, 3)
            z_tx = normal_sample(k1, enc_mean, enc_std)
            z_t = normal_sample(k2, prior_mean, prior_std)
            dec = self._dec_n(jnp.concatenate([ht, self._phi_z_n(z_tx)], -1))
            nll = self.head.nll(dec, x_t, k3)
            kl = normal_kl(enc_mean, enc_std, prior_mean, prior_std)
            out = dict(kl=kl, nll=nll, enc_mean=enc_mean, enc_std=enc_std,
                       zx_prev=zxprev)
            return (z_t, z_tx), out

        step_fn = jax.checkpoint(step) if self.remat else step
        _, outs = jax.lax.scan(step_fn, (z0, z0x), (x_tm[1:], hs, as_, feats[1:], keys))

        nll_loss = jnp.sum(outs["nll"], axis=0)
        if cfg.D + 1 == 1:
            kl_loss = jnp.sum(outs["kl"], axis=0)  # [B, z]
        else:
            kl_loss = self._overshoot_kl(
                hs, outs["enc_mean"], outs["enc_std"], outs["zx_prev"], rng
            )
        return dict(
            kl_free_bits=jnp.mean(batch_reduce(kl_loss)),
            kl=jnp.mean(batch_reduce(kl_loss)),
            nll=jnp.mean(nll_loss),
        )

    def _overshoot_kl(self, hs, enc_means, enc_stds, zx_prevs, rng):
        """Latent overshooting (reference SRNN.py:308-335), vectorized over t."""
        cfg = self.cfg
        D = cfg.D + 1
        n_t = hs.shape[0]
        d_t = jnp.minimum(n_t - jnp.arange(n_t), D).astype(jnp.float32)
        acc = jnp.zeros_like(enc_means)
        zprev = zx_prevs
        for d in range(D):
            n = n_t - d
            if n <= 0:
                break
            ht_d = hs[d:]
            zp = zprev[:n]
            pz = self._phi_z_n(zp.reshape(-1, zp.shape[-1]))
            hflat = ht_d.reshape((-1,) + ht_d.shape[2:])
            pm, ps = self._prior_n(jnp.concatenate([hflat, pz], -1))
            pm = pm.reshape(zp.shape)
            ps = ps.reshape(zp.shape)
            key = jax.random.fold_in(rng, 2000 + d)
            zprev = pm + ps * jax.random.normal(key, pm.shape, pm.dtype)
            em, es = enc_means[d:], enc_stds[d:]
            if d > 0:
                em, es = jax.lax.stop_gradient(em), jax.lax.stop_gradient(es)
            kl_d = normal_kl(em, es, pm, ps)
            w = (cfg.overshot_w / d_t[:n]).reshape((n,) + (1,) * (kl_d.ndim - 1))
            acc = acc.at[:n].add(w * kl_d)
        return jnp.sum(acc, axis=0)

    # ------------------------------------------------------------------
    def predict(self, x, n_predictions: int, n_conditions: int, rng):
        """Reference SRNN.py:341-395."""
        cfg = self.cfg
        b = x.shape[0]
        feats = self._features(x[:, :n_conditions])
        h0, c0, _, _, z0, _ = self.get_inits(b)
        hs, h, c = conv_lstm_scan(self.lstm_h, feats[:-1], h0, c0)
        kw, kr = jax.random.split(rng)

        def warm(zprev, xs):
            ht, key = xs
            pm, ps = self._prior_params(ht, zprev)
            return normal_sample(key, pm, ps), None

        zprev, _ = jax.lax.scan(
            warm, z0, (hs, jax.random.split(kw, n_conditions - 1))
        )
        prediction = x[:, n_conditions - 1]

        def step(carry, key):
            h, c, zprev, pred = carry
            ut = self._phi_x_n(pred)
            h, c = self.lstm_h(ut, h, c)
            pm, ps = self._prior_params(h, zprev)
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
        """Posterior reconstructions [T-1,B,H,W,C] (reference :397-451)."""
        cfg = self.cfg
        b, t = x.shape[:2]
        feats = self._features(x)
        h0, c0, a0, ca0, _, z0x = self.get_inits(b)
        hs, _, _ = conv_lstm_scan(self.lstm_h, feats[:-1], h0, c0)
        if cfg.enable_smoothing:
            a_in = jnp.concatenate([hs, feats[1:]], -1)
            as_, _, _ = conv_lstm_scan(self.lstm_a, a_in, a0, ca0, reverse=True)
        else:
            as_ = jnp.zeros((t - 1, b, 1, 1, 1))
        keys = jax.random.split(rng, t - 1)

        def step(zxprev, xs):
            ht, at, feat_t, key = xs
            if cfg.enable_smoothing:
                enc_in = jnp.concatenate([at, self._phi_z_n(zxprev)], -1)
            else:
                enc_in = jnp.concatenate([ht, self._phi_z_n(zxprev), feat_t], -1)
            enc_mean, enc_std = self._enc_n(enc_in)
            if cfg.res_q:
                pm, _ = self._prior_params(ht, zxprev)
                enc_mean = pm + enc_mean
            k1, k2 = jax.random.split(key)
            z_tx = normal_sample(k1, enc_mean, enc_std)
            dec = self._dec_n(jnp.concatenate([ht, self._phi_z_n(z_tx)], -1))
            return z_tx, self.head.decode(dec, k2)

        _, recons = jax.lax.scan(step, z0x, (hs, as_, feats[1:], keys))
        return recons

    def sample(self, x, n_samples: int, rng):
        """Free-running prior rollout from frame 0 (reference :453-480)."""
        b = x.shape[0]
        h, c, _, _, zprev, _ = self.get_inits(b)

        def step(carry, key):
            h, c, zprev, frame = carry
            ut = self._phi_x_n(frame)
            h, c = self.lstm_h(ut, h, c)
            pm, ps = self._prior_params(h, zprev)
            k1, k2 = jax.random.split(key)
            z_t = normal_sample(k1, pm, ps)
            dec = self._dec_n(jnp.concatenate([h, self._phi_z_n(z_t)], -1))
            s = self.head.decode(dec, k2)
            return (h, c, z_t, s), s

        _, samples = jax.lax.scan(
            step, (h, c, zprev, x[:, 0]), jax.random.split(rng, n_samples)
        )
        return samples

    # ------------------------------------------------------------------
    def elbo_importance_weighting(self, x, K: int, rng):
        """K-sample importance-weighted ELBO (tighter eval bound).

        Correct IWAE bound: -E[logsumexp_k(log p(x|z_k) + log p(z_k) -
        log q(z_k|x)) - log K]; the K samples are drawn vmapped per step
        (the reference loops K python iterations and advances the latent
        chain inside the K loop, SRNN.py:511-576 — here the chain advances
        once per timestep with the first posterior sample).
        """
        cfg = self.cfg
        b, t = x.shape[:2]
        feats = self._features(x)
        h0, c0, a0, ca0, z0, z0x = self.get_inits(b)
        hs, _, _ = conv_lstm_scan(self.lstm_h, feats[:-1], h0, c0)
        if cfg.enable_smoothing:
            a_in = jnp.concatenate([hs, feats[1:]], -1)
            as_, _, _ = conv_lstm_scan(self.lstm_a, a_in, a0, ca0, reverse=True)
        else:
            as_ = jnp.zeros((t - 1, b, 1, 1, 1))
        x_tm = x.swapaxes(0, 1)
        keys = jax.random.split(rng, t - 1)

        def step(carry, xs):
            zprev, zxprev = carry
            x_t, ht, at, feat_t, key = xs
            if cfg.enable_smoothing:
                enc_in = jnp.concatenate([at, self._phi_z_n(zxprev)], -1)
            else:
                enc_in = jnp.concatenate([ht, self._phi_z_n(zxprev), feat_t], -1)
            enc_mean, enc_std = self._enc_n(enc_in)
            if cfg.res_q:
                pm, ps = self._prior_params(ht, zxprev)
                enc_mean = pm + enc_mean
            else:
                pm, ps = self._prior_params(ht, zprev)

            def one_sample(k):
                k1, k2 = jax.random.split(k)
                z_tx = normal_sample(k1, enc_mean, enc_std)
                dec = self._dec_n(jnp.concatenate([ht, self._phi_z_n(z_tx)], -1))
                lpx = -self.head.nll(dec, x_t, k2)
                lpz = jnp.sum(normal_log_prob(z_tx, pm, ps), -1)
                lqzx = jnp.sum(normal_log_prob(z_tx, enc_mean, enc_std), -1)
                return lpx + lpz - lqzx, z_tx

            ws, zs = jax.vmap(one_sample)(jax.random.split(key, K))  # [K,B]
            iw = jax.scipy.special.logsumexp(ws, axis=0) - jnp.log(float(K))
            k_last = jax.random.fold_in(key, 7)
            z_t = normal_sample(k_last, pm, ps)
            return (z_t, zs[0]), iw

        _, iws = jax.lax.scan(step, (z0, z0x), (x_tm[1:], hs, as_, feats[1:], keys))
        return -jnp.mean(jnp.sum(iws, axis=0))
