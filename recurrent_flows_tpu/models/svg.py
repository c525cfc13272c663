"""SVG-LP — stochastic video generation with a learned prior, TPU-native.

Capability-parity rebuild of reference SVG/SVG.py:201-388 (itself adapted
from edenton/svg): VGG encoder to a 1x1 bottleneck with 4 skip maps,
mirrored decoder, frame-predictor LSTM, posterior & learned-prior gaussian
LSTMs over vector latents; losses {bernoulli | mse | gaussian}; analytic
KL between the two gaussian LSTMs; predict/reconstruct/sample and an
importance-weighted ELBO.

TPU-first: all frames are encoded in one batched pass; the per-step
LSTM/decoder phase is one lax.scan carrying the three LSTM states.
The encoder/decoder generalize the reference's hardwired 64x64 geometry to
any power-of-two image size >= 16.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import SVGConfig
from ..nn.dense_lstm import SVGGaussianLSTM, SVGLSTM
from ..nn.layers import NormLayer, conv2d
from ..utils.numerics import batch_reduce, normal_kl, normal_log_prob

_CHANNELS = (64, 128, 256, 512)
_LAYERS = (2, 2, 3, 3)
# decoder vgg-layer counts per stage: the reference decoder runs ONE vgg
# layer at the finest scale ('out', SVG.py:100-104) but 2/3/3 at the
# coarser ones (upc4/upc3/upc2)
_DEC_LAYERS = (1, 2, 3, 3)


def _vgg_layer(x, ch, norm_type, name_prefix, module, track=False, ura=False):
    x = conv2d(ch, 3, name=f"{name_prefix}_conv")(x)
    x = NormLayer(norm_type, track_running_stats=track,
                  name=f"{name_prefix}_norm")(x, ura)
    return jax.nn.leaky_relu(x, 0.2)


class SVGEncoder(nn.Module):
    """VGG encoder -> ([B, dim] bottleneck, skip maps) (reference :27-71)."""

    dim: int
    image_size: int
    norm_type: str = "batchnorm"
    track_running_stats: bool = False

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        trs, ura = self.track_running_stats, use_running_average
        n_stages = max(1, (self.image_size.bit_length() - 1) - 2)  # 64 -> 4
        skips = []
        for s in range(n_stages):
            ch = _CHANNELS[min(s, len(_CHANNELS) - 1)]
            for l in range(_LAYERS[min(s, len(_LAYERS) - 1)]):
                x = _vgg_layer(x, ch, self.norm_type, f"c{s}_{l}", self, trs, ura)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        k = x.shape[1]  # remaining spatial extent (4 for 64x64)
        x = nn.Conv(self.dim, (k, k), padding="VALID", name="bottleneck")(x)
        x = NormLayer(self.norm_type, track_running_stats=trs,
                      name="bottleneck_norm")(x, ura)
        x = jnp.tanh(x)
        return x.reshape(x.shape[0], self.dim), skips


class SVGDecoder(nn.Module):
    """Mirrored decoder consuming skips, sigmoid output (reference :73-120)."""

    dim: int
    image_size: int
    channels: int = 1
    norm_type: str = "batchnorm"
    track_running_stats: bool = False

    @nn.compact
    def __call__(self, vec, skips, use_running_average: bool = False):
        trs, ura = self.track_running_stats, use_running_average
        n_stages = max(1, (self.image_size.bit_length() - 1) - 2)
        k = self.image_size // (2 ** n_stages)
        x = vec.reshape(vec.shape[0], 1, 1, self.dim)
        x = nn.ConvTranspose(512, (k, k), padding="VALID", name="up0")(x)
        x = NormLayer(self.norm_type, track_running_stats=trs,
                      name="up0_norm")(x, ura)
        x = jax.nn.leaky_relu(x, 0.2)
        for s in reversed(range(n_stages)):
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
            x = jnp.concatenate([x, skips[s]], axis=-1)
            ch = _CHANNELS[min(s, len(_CHANNELS) - 1)]
            n_l = _DEC_LAYERS[min(s, len(_DEC_LAYERS) - 1)]
            for l in range(n_l):
                out_ch = ch if l < n_l - 1 else _CHANNELS[max(s - 1, 0)] if s > 0 else 64
                x = _vgg_layer(x, out_ch, self.norm_type, f"d{s}_{l}", self, trs, ura)
        x = conv2d(self.channels, 3, name="out_conv")(x)
        return jax.nn.sigmoid(x)


class SVG(nn.Module):
    cfg: SVGConfig
    remat: bool = True
    # torch model.eval() equivalent (instance-global): normalize with
    # running-average batch stats; requires cfg.track_running_stats.
    eval_norm: bool = False

    def setup(self):
        cfg = self.cfg
        self._ura = bool(self.eval_norm and cfg.track_running_stats)
        trs = cfg.track_running_stats
        self.encoder = SVGEncoder(cfg.c_features, cfg.image_size, cfg.norm_type,
                                  track_running_stats=trs, name="encoder")
        self.decoder = SVGDecoder(cfg.c_features, cfg.image_size, cfg.x_channels,
                                  cfg.norm_type, track_running_stats=trs,
                                  name="decoder")
        self.frame_predictor = SVGLSTM(
            cfg.c_features, cfg.h_dim, cfg.predictor_rnn_layers, name="frame_predictor"
        )
        self.posterior = SVGGaussianLSTM(
            cfg.z_dim, cfg.h_dim, cfg.posterior_rnn_layers, name="posterior"
        )
        self.prior = SVGGaussianLSTM(
            cfg.z_dim, cfg.h_dim, cfg.prior_rnn_layers, name="prior"
        )

    def _encode_all(self, x):
        b, t = x.shape[:2]
        h, skips = self._enc_n(x.reshape((b * t,) + x.shape[2:]))

        def tm(a):
            return a.reshape((b, t) + a.shape[1:]).swapaxes(0, 1)

        return tm(h), [tm(s) for s in skips]

    def _init_states(self, batch):
        return (
            self.frame_predictor.init_state(batch),
            self.posterior.init_state(batch),
            self.prior.init_state(batch),
        )

    def _nll(self, x_pred, x_t):
        cfg = self.cfg
        if cfg.loss_type == "bernoulli":
            p = jnp.clip(x_pred, 1e-6, 1 - 1e-6)
            return -batch_reduce(x_t * jnp.log(p) + (1 - x_t) * jnp.log1p(-p))
        if cfg.loss_type == "mse":
            return batch_reduce(jnp.square(x_pred - x_t))
        if cfg.loss_type == "gaussian":
            return -batch_reduce(
                normal_log_prob(x_t, x_pred, cfg.variance * jnp.ones_like(x_pred))
            )
        raise ValueError(f"undefined loss {cfg.loss_type}")

    # ------------------------------------------------------------------
    def _enc_n(self, x):
        return self.encoder(x, self._ura)

    def _dec_n(self, vec, skips):
        return self.decoder(vec, skips, self._ura)

    def stats_refresh(self, x, rng):
        """Out-of-scan forward refreshing batchnorm running stats (apply
        with mutable=['batch_stats']). Requires cfg.track_running_stats."""
        return self.__call__(x, rng)

    def __call__(self, x, rng):
        """Init-only: one unscanned step."""
        b = x.shape[0]
        hs, skips = self._encode_all(x[:, :2])
        fp, po, pr = self._init_states(b)
        z_t, mu_q, std_q, po = self.posterior(hs[1], po, rng)
        _, mu_p, std_p, pr = self.prior(hs[0], pr, rng)
        h_pred, fp = self.frame_predictor(jnp.concatenate([hs[0], z_t], -1), fp)
        x_pred = self._dec_n(h_pred, [s[0] for s in skips])
        return self._nll(x_pred, x[:, 1])

    def loss(self, x, rng):
        b, t = x.shape[:2]
        hs, skips = self._encode_all(x)
        states = self._init_states(b)
        keys = jax.random.split(rng, t - 1)
        x_tm = x.swapaxes(0, 1)

        def step(carry, xs):
            fp, po, pr = carry
            h, h_target, skip, x_t, key = xs
            z_t, mu_q, std_q, po = self.posterior(h_target, po, key)
            _, mu_p, std_p, pr = self.prior(h, pr, key)
            h_pred, fp = self.frame_predictor(jnp.concatenate([h, z_t], -1), fp)
            x_pred = self._dec_n(h_pred, skip)
            nll = self._nll(x_pred, x_t)
            kl = normal_kl(mu_q, std_q, mu_p, std_p)
            return (fp, po, pr), dict(nll=nll, kl=kl)

        step_fn = jax.checkpoint(step) if self.remat else step
        xs = (hs[:-1], hs[1:], [s[:-1] for s in skips], x_tm[1:], keys)
        _, outs = jax.lax.scan(step_fn, states, xs)
        kl_loss = jnp.sum(outs["kl"], axis=0)
        nll_loss = jnp.sum(outs["nll"], axis=0)
        return dict(
            kl_free_bits=jnp.mean(batch_reduce(kl_loss)),
            kl=jnp.mean(batch_reduce(kl_loss)),
            nll=jnp.mean(nll_loss),
        )

    # ------------------------------------------------------------------
    def predict(self, x, n_predictions: int, n_conditions: int, rng):
        """Posterior-driven warmup, then learned-prior rollout (reference :314-342)."""
        b = x.shape[0]
        states = self._init_states(b)
        kw, kr = jax.random.split(rng)
        hs, skips = self._encode_all(x[:, :n_conditions])

        def warm(carry, xs):
            fp, po, pr = carry
            h, h_target, key = xs
            z_t, _, _, po = self.posterior(h_target, po, key)
            _, _, _, pr = self.prior(h, pr, key)
            _, fp = self.frame_predictor(jnp.concatenate([h, z_t], -1), fp)
            return (fp, po, pr), None

        states, _ = jax.lax.scan(
            warm, states, (hs[:-1], hs[1:], jax.random.split(kw, n_conditions - 1))
        )
        x_in = x[:, n_conditions - 1]

        def step(carry, key):
            fp, po, pr, x_in = carry
            h, skip = self._enc_n(x_in)
            z_t, _, _, pr = self.prior(h, pr, key)
            h_pred, fp = self.frame_predictor(jnp.concatenate([h, z_t], -1), fp)
            x_pred = self._dec_n(h_pred, skip)
            return (fp, po, pr, x_pred), x_pred

        _, preds = jax.lax.scan(
            step, states + (x_in,), jax.random.split(kr, n_predictions)
        )
        return x[:, :n_conditions].swapaxes(0, 1), preds

    def reconstruct(self, x, rng):
        """Posterior reconstructions (reference :273-291)."""
        b, t = x.shape[:2]
        hs, skips = self._encode_all(x)
        states = self._init_states(b)
        keys = jax.random.split(rng, t - 1)

        def step(carry, xs):
            fp, po, pr = carry
            h, h_target, skip, key = xs
            z_t, _, _, po = self.posterior(h_target, po, key)
            h_pred, fp = self.frame_predictor(jnp.concatenate([h, z_t], -1), fp)
            x_pred = self._dec_n(h_pred, skip)
            return (fp, po, pr), x_pred

        _, recons = jax.lax.scan(
            step, states, (hs[:-1], hs[1:], [s[:-1] for s in skips], keys)
        )
        return recons

    def sample(self, x, n_samples: int, rng):
        """Free-running learned-prior rollout from frame 0 (reference :293-312)."""
        b = x.shape[0]
        states = self._init_states(b)

        def step(carry, key):
            fp, po, pr, x_in = carry
            h, skip = self._enc_n(x_in)
            z_t, _, _, pr = self.prior(h, pr, key)
            h_pred, fp = self.frame_predictor(jnp.concatenate([h, z_t], -1), fp)
            x_pred = self._dec_n(h_pred, skip)
            return (fp, po, pr, x_pred), x_pred

        _, samples = jax.lax.scan(
            step, states + (x[:, 0],), jax.random.split(rng, n_samples)
        )
        return samples

    def elbo_importance_weighting(self, x, K: int, rng):
        """K-sample IW-ELBO (reference :344-385; vmapped over K)."""
        b, t = x.shape[:2]
        hs, skips = self._encode_all(x)
        states = self._init_states(b)
        keys = jax.random.split(rng, t - 1)

        def step(carry, xs):
            fp, po, pr = carry
            h, h_target, skip, x_t, key = xs
            z_t, mu_q, std_q, po = self.posterior(h_target, po, key)
            _, mu_p, std_p, pr = self.prior(h, pr, key)

            def one_sample(k):
                z = mu_q + std_q * jax.random.normal(k, mu_q.shape)
                h_pred, _ = self.frame_predictor(jnp.concatenate([h, z], -1), fp)
                x_pred = self._dec_n(h_pred, skip)
                lpx = -self._nll(x_pred, x_t)
                lpz = jnp.sum(normal_log_prob(z, mu_p, std_p), -1)
                lqzx = jnp.sum(normal_log_prob(z, mu_q, std_q), -1)
                return lpx + lpz - lqzx

            ws = jax.vmap(one_sample)(jax.random.split(key, K))
            iw = jax.scipy.special.logsumexp(ws, axis=0) - jnp.log(float(K))
            h_pred, fp = self.frame_predictor(jnp.concatenate([h, z_t], -1), fp)
            return (fp, po, pr), iw

        xs = (hs[:-1], hs[1:], [s[:-1] for s in skips], x.swapaxes(0, 1)[1:], keys)
        _, iws = jax.lax.scan(step, states, xs)
        return -jnp.mean(jnp.sum(iws, axis=0))
