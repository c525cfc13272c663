"""RFN — Recurrent Flow Network (the thesis model), TPU-native.

Capability-parity rebuild of reference RFN/RFN_new.py:7-788:
SRNN-style temporal latent prior + conditional multiscale Glow decoder,
optional backward smoothing LSTM, residual posterior (res_q), latent
overshooting, free-bits, and the three flow skip modes.

TPU-first design decisions (vs the reference's python loops):
  * Frame features for all T frames come from ONE batched extractor call
    over B*T (large MXU batches) instead of T sequential forwards
    (reference :126-128).
  * The h-LSTM / smoothing a-LSTM unrolls are ``lax.scan`` (forward /
    reverse) over time-major features (reference :131-153).
  * The per-step prior/encoder/upscaler/flow phase is one ``lax.scan``
    whose body is optionally rematerialized (memory ~ one step's
    activations instead of T) (reference :158-211).
  * Latent overshooting is vectorized over t for each overshoot depth d
    (one batched prior call per d instead of (T*D) python steps)
    (reference :213-240).
  * Learned initial states are batch-size-agnostic [1, ...] params
    broadcast at runtime (deliberate fix of reference :69-76 which sizes
    them by batch, making checkpoints batch-dependent).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..config import RFNConfig
from ..flows.glow import ListGlow
from ..nn.convlstm import ConvLSTMCell, conv_lstm_scan
from ..nn.layers import SimpleParamNet
from ..nn.vgg import VGGDownscaler, VGGUpscaler
from ..utils.numerics import batch_reduce, free_bits_kl, normal_kl, normal_sample


class RFN(nn.Module):
    cfg: RFNConfig
    # remat=True measured FASTER on v5e for the KTH-size train step
    # (20.8 vs 18.4 steps/s): recomputing the scan body beats spilling its
    # activations to HBM. Keep on.
    remat: bool = True
    # compute dtype for the MXU-bound conv stacks (extractor/upscaler/LSTMs);
    # the flow's logdet-sensitive math always runs f32. e.g. jnp.bfloat16.
    compute_dtype: object = None
    # torch model.eval() equivalent (instance-global, like the reference's):
    # normalize with running-average batch stats everywhere. Only effective
    # when cfg.track_running_stats is on (evaluation_metrics/error_metrics.py:70).
    eval_norm: bool = False
    # hoist the flow's log_prob out of the time scan and run it once over
    # (T-1)*B rows. Measured SLOWER on v5e for the thesis config (142 vs
    # 112 ms loss+grad — the flow is latency- not compute-bound, and the
    # scanned form wins); kept as an opt-in structure for future configs
    # with larger T or deeper flows. scripts/bench_prodstep.py measures it.
    batch_flow: bool = False
    # jax.checkpoint policy name for the scan-body remat. Default
    # 'save_flow_x': save the flow's per-GlowStep carries (tagged with
    # checkpoint_name in ListGlow.f) so the backward recomputes each
    # step's coupling intermediates from its saved input in PARALLEL
    # instead of replaying the 50-step SERIAL chain — measured 104.8 vs
    # 108.0 ms on the prod train step (+3.0%, interleaved in-session
    # blocks, scripts/bench_prodstep.py --ab remat, docs/PERF.md round 5),
    # ~10 MB/frame extra HBM. Any other attribute name from
    # jax.checkpoint_policies also works ('dots_saveable' measured and
    # rejected, docs/PERF.md); None = plain full remat.
    remat_policy: str | None = "save_flow_x"
    # lax.scan unroll factor for the per-step loss scan and the
    # autoregressive predict rollout. >1 packs that many (still
    # individually remat'd) steps per loop iteration, removing scan
    # boundaries and letting XLA fuse across adjacent timesteps, at the
    # cost of compile time. A/B'd by scripts/bench_prodstep.py
    # --scan_unroll; see docs/PERF.md for the measured verdict.
    scan_unroll: int = 1

    # ------------------------------------------------------------------
    def setup(self):
        cfg = self.cfg
        self._use_skip_list = not (
            cfg.skip_connection_flow == "without_skip"
            and not cfg.skip_connection_features
        )
        self._ura = bool(self.eval_norm and cfg.track_running_stats)
        self.extractor = VGGDownscaler(
            cfg.extractor_structure,
            norm_type=cfg.norm_type_features,
            non_lin="relu",
            scale=cfg.structure_scaler,
            skip_con=self._use_skip_list,
            tanh=cfg.downscaler_tanh,
            dtype=self.compute_dtype,
            track_running_stats=cfg.track_running_stats,
        )
        self.upscaler = VGGUpscaler(
            cfg.upscaler_structure,
            norm_type=cfg.norm_type_features,
            non_lin="leakyrelu",
            scale=cfg.structure_scaler,
            skips=cfg.skip_connection_features,
            tanh=cfg.upscaler_tanh,
            dtype=self.compute_dtype,
            track_running_stats=cfg.track_running_stats,
        )
        self.lstm = ConvLSTMCell(cfg.h_dim, dtype=self.compute_dtype, name="lstm")
        if cfg.enable_smoothing:
            self.a_lstm = ConvLSTMCell(cfg.a_dim, dtype=self.compute_dtype, name="a_lstm")
        self.prior = SimpleParamNet(
            cfg.prior_structure, cfg.z_dim, norm_type=cfg.norm_type, non_lin="leakyrelu",
            track_running_stats=cfg.track_running_stats, name="prior",
        )
        self.encoder = SimpleParamNet(
            cfg.encoder_structure, cfg.z_dim, norm_type=cfg.norm_type, non_lin="leakyrelu",
            track_running_stats=cfg.track_running_stats, name="encoder",
        )
        self.flow = ListGlow(cfg.x_channels, cfg.image_size, cfg.glow, name="flow")

        hu = cfg.image_size // (2 ** cfg.L)
        z = nn.initializers.zeros
        self.h_0 = self.param("h_0", z, (1, hu, hu, cfg.h_dim))
        self.c_0 = self.param("c_0", z, (1, hu, hu, cfg.h_dim))
        self.a_0 = self.param("a_0", z, (1, hu, hu, cfg.a_dim))
        self.ca_0 = self.param("ca_0", z, (1, hu, hu, cfg.a_dim))
        self.z_0 = self.param("z_0", z, (1, hu, hu, cfg.z_dim))
        self.z_0x = self.param("z_0x", z, (1, hu, hu, cfg.z_dim))

    # ------------------------------------------------------------------
    def get_inits(self, batch: int):
        """Broadcast the learned initial states to the runtime batch size."""
        rep = lambda p: jnp.broadcast_to(p, (batch,) + p.shape[1:])
        return (rep(self.h_0), rep(self.c_0), rep(self.a_0), rep(self.ca_0),
                rep(self.z_0), rep(self.z_0x))

    def _extract(self, x):
        return self.extractor(x, use_running_average=self._ura)

    def _enc_net(self, x):
        return self.encoder(x, self._ura)

    def _prior_net(self, x):
        return self.prior(x, self._ura)

    def _features(self, x):
        """Extractor over all frames at once: [B,T,H,W,C] -> time-major feats.

        Returns (feats, f_last): ``feats`` is a list of per-block maps
        [T,B,h,w,c] (or None when skip lists are unused); ``f_last`` is the
        last block's map (the ConvLSTM input).
        """
        b, t = x.shape[:2]
        flat = x.reshape((b * t,) + x.shape[2:])
        out = self._extract(flat)

        def tm(a):  # [B*T, ...] -> [T, B, ...]
            a = a.astype(jnp.float32)
            return a.reshape((b, t) + a.shape[1:]).swapaxes(0, 1)

        if self._use_skip_list:
            feats = [tm(o) for o in out]
            return feats, feats[-1]
        return None, tm(out)

    def _flow_conditions(self, ht, zt, skips_prev):
        """Upscaler conditions + skip-mode combination for one step.

        Reference RFN/RFN_new.py:191-201. ``skips_prev`` is the previous
        frame's extractor skip list (high-res first), or None.
        """
        cfg = self.cfg
        hz = jnp.concatenate([ht, zt], axis=-1)
        if cfg.skip_connection_features:
            conds = self.upscaler(hz, skip_list=skips_prev, use_running_average=self._ura)
        else:
            conds = self.upscaler(hz, use_running_average=self._ura)
        conds = [c.astype(jnp.float32) for c in conds]
        if cfg.skip_connection_flow == "with_skip":
            conds = [jnp.concatenate([c, s], axis=-1) for c, s in zip(conds, skips_prev)]
        elif cfg.skip_connection_flow == "only_skip":
            conds = list(skips_prev)
        # 'flow_cond' tags: under remat_policy='save_flow_full' the per-step
        # upscaler outputs are saved across the scan remat (~3 MB/frame at
        # thesis shapes) so the backward skips re-running the upscaler
        conds = [checkpoint_name(c, "flow_cond") for c in conds]
        return conds, checkpoint_name(hz, "flow_cond")

    # ------------------------------------------------------------------
    def __call__(self, x, rng):
        """Init-only entry: exercises every submodule once, no scans.

        x: [B, T>=2, H, W, C].
        """
        cfg = self.cfg
        b = x.shape[0]
        feats, f_last = self._features(x[:, :2])
        h0, c0, a0, ca0, z0, z0x = self.get_inits(b)
        ht, _ = self.lstm(f_last[0], h0, c0)
        if cfg.enable_smoothing:
            at, _ = self.a_lstm(jnp.concatenate([ht, f_last[1]], axis=-1), a0, ca0)
            enc_in = jnp.concatenate([at, z0x], axis=-1)
        else:
            enc_in = jnp.concatenate([ht, z0x, f_last[1]], axis=-1)
        enc_mean, enc_std = self._enc_net(enc_in)
        prior_mean, prior_std = self._prior_net(jnp.concatenate([ht, z0], axis=-1))
        zxt = enc_mean + enc_std * 0.0
        skips_prev = [f[0] for f in feats] if feats is not None else None
        conds, hz = self._flow_conditions(ht, zxt, skips_prev)
        _, nll = self.flow.log_prob(x[:, 1], conds, hz, rng)
        _ = self.flow.sample(None, conds, hz, rng, temperature=cfg.temperature)
        _ = normal_kl(enc_mean, enc_std, prior_mean, prior_std)
        return nll

    def ddi(self, x, rng, *, ddi: bool = True):
        """Data-dependent-init pass (apply with mutable=['ddi'])."""
        cfg = self.cfg
        b = x.shape[0]
        feats, f_last = self._features(x[:, :2])
        h0, c0, a0, ca0, z0, z0x = self.get_inits(b)
        ht, _ = self.lstm(f_last[0], h0, c0)
        if cfg.enable_smoothing:
            at, _ = self.a_lstm(jnp.concatenate([ht, f_last[1]], axis=-1), a0, ca0)
            enc_in = jnp.concatenate([at, z0x], axis=-1)
        else:
            enc_in = jnp.concatenate([ht, z0x, f_last[1]], axis=-1)
        enc_mean, enc_std = self._enc_net(enc_in)
        rng, k = jax.random.split(rng)
        zxt = normal_sample(k, enc_mean, enc_std)
        skips_prev = [f[0] for f in feats] if feats is not None else None
        conds, hz = self._flow_conditions(ht, zxt, skips_prev)
        _, nll = self.flow.log_prob(x[:, 1], conds, hz, rng, ddi=ddi)
        return nll

    def stats_refresh(self, x, rng):
        """Refresh BatchNormFlow running stats (apply with
        mutable=['batch_stats']) — one forward pass OUTSIDE the training
        scan, since lax.scan bodies cannot mutate collections.

        Needed before reverse-direction sampling when flow_norm='batchnorm'
        (reference alternative keeps running stats inside the module,
        Flow/glow_modules.py:56-104). No-op for flow_norm='actnorm'.
        """
        return self.ddi(x, rng, ddi=False)

    # ------------------------------------------------------------------
    def _unroll_h(self, f_last, batch):
        """Forward h-LSTM over f_last[0:T-1] -> hs [T-1,B,hu,wu,h_dim]."""
        h0, c0, a0, ca0, _, _ = self.get_inits(batch)
        hs, hT, cT = conv_lstm_scan(self.lstm, f_last[:-1], h0, c0)
        return hs, hT, cT

    def _unroll_a(self, hs, f_last, batch):
        """Reverse smoothing a-LSTM: a_j from [h_j, feat_{j+1}], scanned
        backward (reference :142-153)."""
        _, _, a0, ca0, _, _ = self.get_inits(batch)
        a_in = jnp.concatenate([hs, f_last[1:]], axis=-1)
        as_, _, _ = conv_lstm_scan(self.a_lstm, a_in, a0, ca0, reverse=True)
        return as_

    # ------------------------------------------------------------------
    def loss(self, x, rng, logdet: float = 0.0):
        """ELBO pieces over a sequence.

        Returns dict with kl_free_bits, kl, nll (batch means) — the trainer
        combines them as nll + beta*kl_free_bits (reference trainer.py:206).

        Two structures (identical math AND identical RNG consumption — per
        step t, k1 -> prior eps, k2 -> encoder eps, k3 -> dequant uniform;
        tests/rfn_parity_utils.our_loss_noise replicates it):
        - default: flow.log_prob inside the rematerialized time scan
          (measured fastest on v5e for the thesis config);
        - ``batch_flow=True``: the scan only produces per-step flow
          conditions and log_prob runs ONCE over all (T-1)*B rows
          (MXU-sized batches at the deep scales; opt-in, see the
          ``batch_flow`` attribute note).
        """
        cfg = self.cfg
        assert x.ndim == 5, "x must be [B, T, H, W, C]"
        b, t = x.shape[:2]
        feats, f_last = self._features(x)
        hs, _, _ = self._unroll_h(f_last, b)
        if cfg.enable_smoothing:
            as_ = self._unroll_a(hs, f_last, b)
        else:
            as_ = jnp.zeros((t - 1, b, 1, 1, 1))  # unused placeholder

        _, _, _, _, z0, z0x = self.get_inits(b)
        x_tm = x.swapaxes(0, 1)  # time-major [T,B,H,W,C]
        keys = jax.random.split(rng, t - 1)
        skips_prev = [f[:-1] for f in feats] if feats is not None else jnp.zeros((t - 1, 1))

        def step(carry, xs):
            zprev, zxprev = carry
            x_t, ht, at, feat_t, sk_prev, key = xs
            if cfg.enable_smoothing:
                enc_in = jnp.concatenate([at, zxprev], axis=-1)
            else:
                enc_in = jnp.concatenate([ht, zxprev, feat_t], axis=-1)
            enc_mean, enc_std = self._enc_net(enc_in)
            if cfg.res_q:
                prior_mean, prior_std = self._prior_net(
                    jnp.concatenate([ht, zxprev], axis=-1)
                )
                enc_mean = prior_mean + enc_mean
            else:
                prior_mean, prior_std = self._prior_net(
                    jnp.concatenate([ht, zprev], axis=-1)
                )
            k1, k2, k3 = jax.random.split(key, 3)
            zt = normal_sample(k1, prior_mean, prior_std)
            zxt = normal_sample(k2, enc_mean, enc_std)
            conds, hz = self._flow_conditions(
                ht, zxt, sk_prev if feats is not None else None
            )
            kl = normal_kl(enc_mean, enc_std, prior_mean, prior_std)
            out = dict(kl=kl, enc_mean=enc_mean, enc_std=enc_std,
                       zx_prev=zxprev)
            if self.batch_flow:
                out.update(conds=tuple(conds), hz=hz)
            else:
                _, nll = self.flow.log_prob(x_t, conds, hz, k3, logdet=logdet)
                out["nll"] = nll
            return (zt, zxt), out

        if self.remat and self.remat_policy:
            if self.remat_policy == "save_flow_x":
                # save the flow's per-GlowStep x carries (tagged with
                # checkpoint_name in ListGlow.f): the backward then skips
                # re-running the 50-step SERIAL flow chain — each step's
                # coupling intermediates are recomputed from its saved
                # input in PARALLEL. ~10 MB/frame extra HBM.
                pol = jax.checkpoint_policies.save_only_these_names("flow_x")
            elif self.remat_policy == "save_flow_full":
                # additionally save the per-step upscaler conditions
                # ('flow_cond', ~3 MB/frame) and the assembled/folded 1x1
                # and conv weights ('flow_w', KBs): the backward skips the
                # upscaler replay and the per-step weight re-assembly too
                pol = jax.checkpoint_policies.save_only_these_names(
                    "flow_x", "flow_cond", "flow_w"
                )
            elif self.remat_policy == "save_flow_xc":
                # flow_x + upscaler conditions, but weights re-assembled
                pol = jax.checkpoint_policies.save_only_these_names(
                    "flow_x", "flow_cond"
                )
            else:
                pol = getattr(jax.checkpoint_policies, self.remat_policy)
            step_fn = jax.checkpoint(step, policy=pol)
        elif self.remat:
            step_fn = jax.checkpoint(step)
        else:
            step_fn = step
        xs = (x_tm[1:], hs, as_, f_last[1:], skips_prev, keys)
        _, outs = jax.lax.scan(step_fn, (z0, z0x), xs,
                               unroll=min(self.scan_unroll, t - 1))

        if self.batch_flow:
            # time-batched flow: [(T-1)*B, ...] in one device program
            flat = lambda a: a.reshape((-1,) + a.shape[2:])
            n_bins = 2.0 ** cfg.glow.n_bits
            k3s = jax.vmap(lambda k: jax.random.split(k, 3)[2])(keys)
            noise = jax.vmap(
                lambda k: jax.random.uniform(
                    k, x_tm[0].shape, x.dtype, 0.0, 1.0 / n_bins
                )
            )(k3s)  # same per-step draws as the in-scan k3 path

            def flow_nll(x_noised_flat, conds_flat, hz_flat):
                _, nll = self.flow.log_prob(
                    x_noised_flat, conds_flat, hz_flat, rng=None,
                    logdet=logdet, dequantize=False,
                )
                return nll

            nll_flat = flow_nll(
                flat(x_tm[1:] + noise),
                [flat(c) for c in outs.pop("conds")],
                flat(outs.pop("hz")),
            )
            nll_loss = jnp.sum(nll_flat.reshape(t - 1, b), axis=0)  # [B]
        else:
            nll_loss = jnp.sum(outs["nll"], axis=0)  # [B]
        if cfg.D + 1 == 1:
            kl_loss = jnp.sum(outs["kl"], axis=0)  # [B,hu,wu,z]
        else:
            kl_loss = self._overshoot_kl(
                hs, outs["enc_mean"], outs["enc_std"], outs["zx_prev"], rng
            )
        if cfg.free_bits > 0:
            kl_fb = free_bits_kl(kl_loss, cfg.free_bits)
        else:
            kl_fb = kl_loss
        return dict(
            kl_free_bits=jnp.mean(batch_reduce(kl_fb)),
            kl=jnp.mean(batch_reduce(kl_loss)),
            nll=jnp.mean(nll_loss),
        )

    def _overshoot_kl(self, hs, enc_means, enc_stds, zx_prevs, rng):
        """Latent overshooting KL, vectorized over t for each depth d.

        Reference RFN/RFN_new.py:213-240: for each start index idt,
        re-roll the prior D_t = min(T-1-idt, D+1) steps from the stored
        posterior chain value, accumulating overshot_w * KL(stopgrad(q)||p)
        weighted 1/D_t. d=0 gradients flow into q (no detach), d>0 are
        stopped.
        """
        cfg = self.cfg
        D = cfg.D + 1
        n_t = hs.shape[0]  # T-1
        d_t = jnp.minimum(n_t - jnp.arange(n_t), D).astype(jnp.float32)
        acc = jnp.zeros_like(enc_means)  # [T-1, B, hu, wu, z]
        zprev = zx_prevs  # stored posterior chain inputs (reference :188-189)
        for d in range(D):
            n = n_t - d
            if n <= 0:
                break
            ht_d = hs[d:]
            zp = zprev[:n]
            inp = jnp.concatenate([ht_d, zp], axis=-1)
            flat = inp.reshape((-1,) + inp.shape[2:])
            pm, ps = self._prior_net(flat)
            pm = pm.reshape((n,) + zp.shape[1:])
            ps = ps.reshape((n,) + zp.shape[1:])
            key = jax.random.fold_in(rng, 1000 + d)
            zprev = pm + ps * jax.random.normal(key, pm.shape, pm.dtype)
            em, es = enc_means[d:], enc_stds[d:]
            if d > 0:
                em, es = jax.lax.stop_gradient(em), jax.lax.stop_gradient(es)
            kl_d = normal_kl(em, es, pm, ps)
            w = (cfg.overshot_w / d_t[:n]).reshape((n,) + (1,) * (kl_d.ndim - 1))
            acc = acc.at[:n].add(w * kl_d)
        return jnp.sum(acc, axis=0)

    # ------------------------------------------------------------------
    def _warmup(self, x, n_conditions, rng, kl_temperature: float = 1.0):
        """Advance the posterior/prior chain over conditioning frames.

        Reference RFN/RFN_new.py:269-328. Returns final (h, c, zprev) after
        n_conditions-1 steps plus the last frame's feature list.
        """
        cfg = self.cfg
        b = x.shape[0]
        xc = x[:, :n_conditions]
        feats, f_last = self._features(xc)
        hs, hT, cT = self._unroll_h(f_last, b)
        if cfg.enable_smoothing:
            as_ = self._unroll_a(hs, f_last, b)
        else:
            as_ = jnp.zeros((n_conditions - 1, b, 1, 1, 1))
        _, _, _, _, z0, z0x = self.get_inits(b)
        keys = jax.random.split(rng, n_conditions - 1)

        def step(carry, xs):
            zprev, zxprev = carry
            ht, at, feat_t, key = xs
            if cfg.enable_smoothing:
                enc_in = jnp.concatenate([at, zxprev], axis=-1)
            else:
                enc_in = jnp.concatenate([ht, zxprev, feat_t], axis=-1)
            enc_mean, enc_std = self._enc_net(enc_in)
            if cfg.res_q:
                prior_mean, prior_std = self._prior_net(jnp.concatenate([ht, zxprev], -1))
                enc_mean = prior_mean + enc_mean
            else:
                prior_mean, prior_std = self._prior_net(jnp.concatenate([ht, zprev], -1))
            k1, k2 = jax.random.split(key)
            zt = normal_sample(k1, prior_mean, prior_std * kl_temperature)
            zxt = normal_sample(k2, enc_mean, enc_std)
            return (zt, zxt), None

        (zprev, zxprev), _ = jax.lax.scan(
            step, (z0, z0x), (hs, as_, f_last[1:], keys)
        )
        return hT, cT, zprev, zxprev

    def predict(self, x, n_predictions: int, n_conditions: int, rng,
                kl_temperature: float = 1.0):
        """Warm-up on conditioning frames, then autoregressive flow rollout.

        Returns (true_x [n_conditions,B,H,W,C], predictions [n_pred,...]).
        ``kl_temperature`` scales the prior std during prediction (reference
        RFN_new.py:31,320,341). Reference RFN/RFN_new.py:256-360.
        """
        cfg = self.cfg
        rng_w, rng_r = jax.random.split(rng)
        h, c, zprev, _ = self._warmup(x, n_conditions, rng_w,
                                      kl_temperature=kl_temperature)
        prediction = x[:, n_conditions - 1]
        keys = jax.random.split(rng_r, n_predictions)

        def step(carry, key):
            h, c, zprev, prediction = carry
            if self._use_skip_list:
                cond_list = [c.astype(jnp.float32) for c in self._extract(prediction)]
                condition = cond_list[-1]
            else:
                cond_list = None
                condition = self._extract(prediction).astype(jnp.float32)
            h, c = self.lstm(condition, h, c)
            prior_mean, prior_std = self._prior_net(jnp.concatenate([h, zprev], -1))
            k1, k2 = jax.random.split(key)
            zt = normal_sample(k1, prior_mean, prior_std * kl_temperature)
            conds, hz = self._flow_conditions(h, zt, cond_list)
            new_pred = self.flow.sample(
                None, conds, hz, k2, temperature=cfg.temperature
            )
            return (h, c, zt, new_pred), new_pred

        _, preds = jax.lax.scan(step, (h, c, zprev, prediction), keys,
                                unroll=min(self.scan_unroll, n_predictions))
        true_x = x[:, :n_conditions].swapaxes(0, 1)
        return true_x, preds

    def reconstruct(self, x, rng):
        """Posterior reconstructions + the flow bijection check.

        Returns (recons, recons_flow) time-major [T-1, B, H, W, C]:
        recons draws x|z from the base prior given posterior conditions;
        recons_flow maps x->z->x (must reproduce x up to dequant noise —
        the "Recon-Bijection" property, reference RFN/RFN_new.py:437-439).
        """
        cfg = self.cfg
        b, t = x.shape[:2]
        feats, f_last = self._features(x)
        hs, _, _ = self._unroll_h(f_last, b)
        if cfg.enable_smoothing:
            as_ = self._unroll_a(hs, f_last, b)
        else:
            as_ = jnp.zeros((t - 1, b, 1, 1, 1))
        _, _, _, _, _, z0x = self.get_inits(b)
        x_tm = x.swapaxes(0, 1)
        keys = jax.random.split(rng, t - 1)
        skips_prev = [f[:-1] for f in feats] if feats is not None else jnp.zeros((t - 1, 1))

        def step(zxprev, xs):
            x_t, ht, at, feat_t, sk_prev, key = xs
            if cfg.enable_smoothing:
                enc_in = jnp.concatenate([at, zxprev], axis=-1)
            else:
                enc_in = jnp.concatenate([ht, zxprev, feat_t], axis=-1)
            enc_mean, enc_std = self._enc_net(enc_in)
            if cfg.res_q:
                prior_mean, _ = self._prior_net(jnp.concatenate([ht, zxprev], -1))
                enc_mean = prior_mean + enc_mean
            k1, k2, k3, k4 = jax.random.split(key, 4)
            zxt = normal_sample(k1, enc_mean, enc_std)
            conds, hz = self._flow_conditions(
                ht, zxt, sk_prev if feats is not None else None
            )
            z, _ = self.flow.log_prob(x_t, conds, hz, k2)
            recon_flow = self.flow.sample(z, conds, hz, k3, temperature=cfg.temperature)
            recon = self.flow.sample(None, conds, hz, k4, temperature=cfg.temperature)
            return zxt, (recon, recon_flow)

        _, (recons, recons_flow) = jax.lax.scan(
            step, z0x, (x_tm[1:], hs, as_, f_last[1:], skips_prev, keys)
        )
        return recons, recons_flow

    # ------------------------------------------------------------------
    # Diagnostics (reference RFN/RFN_new.py:496-788)
    # ------------------------------------------------------------------
    def _posterior_scan(self, x, rng, kl_temperature: float = 1.0):
        """Shared machinery: run the full posterior/prior chain over x,
        returning per-step distribution params, samples, h's and feature
        skips (time-major)."""
        cfg = self.cfg
        b, t = x.shape[:2]
        feats, f_last = self._features(x)
        hs, _, _ = self._unroll_h(f_last, b)
        if cfg.enable_smoothing:
            as_ = self._unroll_a(hs, f_last, b)
        else:
            as_ = jnp.zeros((t - 1, b, 1, 1, 1))
        _, _, _, _, z0, z0x = self.get_inits(b)
        keys = jax.random.split(rng, t - 1)

        def step(carry, xs):
            zprev, zxprev = carry
            ht, at, feat_t, key = xs
            if cfg.enable_smoothing:
                enc_in = jnp.concatenate([at, zxprev], axis=-1)
            else:
                enc_in = jnp.concatenate([ht, zxprev, feat_t], axis=-1)
            enc_mean, enc_std = self._enc_net(enc_in)
            if cfg.res_q:
                prior_mean, prior_std = self._prior_net(jnp.concatenate([ht, zxprev], -1))
                enc_mean = prior_mean + enc_mean
            else:
                prior_mean, prior_std = self._prior_net(jnp.concatenate([ht, zprev], -1))
            k1, k2 = jax.random.split(key)
            zt = normal_sample(k1, prior_mean, prior_std * kl_temperature)
            zxt = normal_sample(k2, enc_mean, enc_std)
            out = dict(prior_mean=prior_mean, prior_std=prior_std,
                       enc_mean=enc_mean, enc_std=enc_std, zt=zt, zxt=zxt)
            return (zt, zxt), out

        _, outs = jax.lax.scan(step, (z0, z0x), (hs, as_, f_last[1:], keys))
        return outs, hs, feats

    def param_analysis(self, x, rng):
        """Prior/posterior/base-dist parameter trajectories + predictions.

        Returns dict(mu_p, std_p, mu_q, std_q, mu_flow, std_flow,
        predictions), all time-major — reference RFN/RFN_new.py:496-588,
        consumed by the evaluator's param_plots with the synchronized
        MovingMNIST hit_boundary channel.
        """
        outs, hs, feats = self._posterior_scan(x, rng)
        t1 = hs.shape[0]
        keys = jax.random.split(jax.random.fold_in(rng, 1), t1)
        skips_prev = ([f[:-1] for f in feats] if feats is not None
                      else jnp.zeros((t1, 1)))

        def step(_, xs):
            ht, zxt, zt, sk_prev, key = xs
            conds, _ = self._flow_conditions(
                ht, zxt, sk_prev if feats is not None else None
            )
            base = jnp.concatenate([ht, zt], axis=-1)
            pred, (mu_f, std_f) = self.flow.sample(
                None, conds, base, key, temperature=1.0, eval_params=True
            )
            return 0, dict(pred=pred, mu_flow=mu_f, std_flow=std_f)

        _, flow_outs = jax.lax.scan(
            step, 0, (hs, outs["zxt"], outs["zt"], skips_prev, keys)
        )
        return dict(
            mu_p=outs["prior_mean"], std_p=outs["prior_std"],
            mu_q=outs["enc_mean"], std_q=outs["enc_std"],
            mu_flow=flow_outs["mu_flow"], std_flow=flow_outs["std_flow"],
            predictions=flow_outs["pred"],
        )

    def probability_future(self, x, n_conditions: int, rng):
        """NLL of each future frame under the frozen context at t=n_conditions,
        for both the prior and posterior latents.

        Returns [B, 2, T - n_conditions] (0=prior z, 1=posterior z) —
        reference RFN/RFN_new.py:590-685.
        """
        t = x.shape[1]
        outs, hs, feats = self._posterior_scan(x[:, :n_conditions], rng)
        ht = hs[-1]
        zt, zxt = outs["zt"][-1], outs["zxt"][-1]
        sk = [f[n_conditions - 2] for f in feats] if feats is not None else None
        futures = x.swapaxes(0, 1)[n_conditions:]
        keys = jax.random.split(jax.random.fold_in(rng, 2), futures.shape[0])

        def nll_for(zk):
            conds, _ = self._flow_conditions(ht, zk, sk)
            base = jnp.concatenate([ht, zk], axis=-1)

            def step(_, xs):
                x_t, key = xs
                _, nll = self.flow.log_prob(x_t, conds, base, key)
                return 0, nll

            _, nlls = jax.lax.scan(step, 0, (futures, keys))
            return nlls  # [T - n_cond, B]

        prior_nll = nll_for(zt)
        post_nll = nll_for(zxt)
        return jnp.stack([prior_nll, post_nll], axis=0).transpose(2, 0, 1)

    def reconstruct_elbo_gap(self, x, rng, sample: bool = True):
        """Per-frame NLL under prior vs posterior latents + per-frame KL.

        Returns (recons, recons_flow, kld_seq [T-1,B], nll_seq [2,T-1,B])
        — the amortization/prior-mismatch diagnostic, reference
        RFN/RFN_new.py:687-788.
        """
        outs, hs, feats = self._posterior_scan(x, rng)
        t1 = hs.shape[0]
        x_tm = x.swapaxes(0, 1)
        keys = jax.random.split(jax.random.fold_in(rng, 3), t1)
        skips_prev = ([f[:-1] for f in feats] if feats is not None
                      else jnp.zeros((t1, 1)))
        kld = jnp.sum(
            normal_kl(outs["enc_mean"], outs["enc_std"],
                      outs["prior_mean"], outs["prior_std"]),
            axis=(2, 3, 4),
        )  # [T-1, B]

        def step(_, xs):
            x_t, ht, zt, zxt, sk_prev, key = xs
            res = []
            recs = []
            for zk, kk in ((zt, 0), (zxt, 1)):
                conds, _ = self._flow_conditions(
                    ht, zk, sk_prev if feats is not None else None
                )
                base = jnp.concatenate([ht, zk], axis=-1)
                k1, k2, k3 = jax.random.split(jax.random.fold_in(key, kk), 3)
                z, nll = self.flow.log_prob(x_t, conds, base, k1)
                res.append(nll)
                if sample:
                    rf = self.flow.sample(z, conds, base, k2,
                                          temperature=self.cfg.temperature)
                    rp = self.flow.sample(None, conds, base, k3,
                                          temperature=self.cfg.temperature)
                    recs.append((rp, rf))
            out = dict(nll=jnp.stack(res))
            if sample:
                out["recons"] = jnp.stack([r[0] for r in recs])
                out["recons_flow"] = jnp.stack([r[1] for r in recs])
            return 0, out

        _, o = jax.lax.scan(
            step, 0, (x_tm[1:], hs, outs["zt"], outs["zxt"], skips_prev, keys)
        )
        recons = o.get("recons")
        recons_flow = o.get("recons_flow")
        return recons, recons_flow, kld, o["nll"].transpose(1, 0, 2)

    def get_zt_ht_from_seq(self, x, n_conditions: int, rng):
        """(z_t, h_t) context at the end of a conditioning prefix — the
        latent-interpolation support API (legacy reference RFN/RFN.py:225-287,
        used by the evaluator's get_interpolations)."""
        outs, hs, feats = self._posterior_scan(x[:, :n_conditions], rng)
        sk = [f[n_conditions - 2] for f in feats] if feats is not None else None
        return outs["zxt"][-1], hs[-1], sk

    def predicts_from_zt_ht(self, zt, ht, skips, rng):
        """Decode a frame from an explicit (z_t, h_t) pair (for latent
        interpolation grids)."""
        conds, base = self._flow_conditions(ht, zt, skips)
        return self.flow.sample(None, conds, base, rng,
                                temperature=self.cfg.temperature)

    def sample(self, x, n_samples: int, rng):
        """Free-running prior rollout seeded by frame 0 (reference :453-494)."""
        cfg = self.cfg
        b = x.shape[0]
        h, c, _, _, zprev, _ = self.get_inits(b)
        keys = jax.random.split(rng, n_samples)

        def step(carry, key):
            h, c, zprev, frame = carry
            if self._use_skip_list:
                cond_list = [c.astype(jnp.float32) for c in self._extract(frame)]
                condition = cond_list[-1]
            else:
                cond_list = None
                condition = self._extract(frame).astype(jnp.float32)
            h, c = self.lstm(condition, h, c)
            prior_mean, prior_std = self._prior_net(jnp.concatenate([h, zprev], -1))
            k1, k2 = jax.random.split(key)
            zt = normal_sample(k1, prior_mean, prior_std)
            conds, hz = self._flow_conditions(h, zt, cond_list)
            s = self.flow.sample(None, conds, hz, k2, temperature=cfg.temperature)
            return (h, c, zt, s), s

        _, samples = jax.lax.scan(step, (h, c, zprev, x[:, 0]), keys)
        return samples
