"""Glow building blocks (NHWC, flax.linen).

TPU-native re-design of reference Flow/glow_modules.py:

  * ActNorm data-dependent init is a *pure* pass: in ``ddi=True`` mode each
    ActNorm computes statistics from its own (already-DDI'd-upstream) input,
    uses them, and sows them to the ``'ddi'`` collection; the caller merges
    them into params (see flows/ddi.py). This reproduces the reference's
    in-place first-batch init (glow_modules.py:22-36) in one traced pass
    with no mutable buffers.
  * InvConv inverse uses triangular solves instead of ``torch.inverse``
    (glow_modules.py:198-203) — better conditioned, identical semantics.
  * Channel axis is last everywhere.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from jax.ad_checkpoint import checkpoint_name

from ..nn.layers import act
from ..utils.numerics import batch_reduce, normal_log_prob, split_feature


class ActNorm(nn.Module):
    """Per-channel scale+bias with data-dependent init.

    forward: y = (x + bias) * exp(logs); logdet += sum(logs) * H * W.
    Reference: Flow/glow_modules.py:10-54.
    """

    num_channels: int

    def setup(self):
        # setup-style (not compact) so parents can read bias/logs for the
        # conv-weight fold (Conv2dNorm) without running the elementwise op
        z = nn.initializers.zeros
        self.bias = self.param("bias", z, (self.num_channels,))
        self.logs = self.param("logs", z, (self.num_channels,))

    def __call__(self, x, logdet=None, reverse: bool = False, ddi: bool = False):
        bias, logs = self.bias, self.logs
        if ddi:
            # ddof=1 to match torch.std (glow_modules.py:28); stats in f32
            # even when x is a bf16 coupling-net activation, so sown DDI
            # values (-> params) are always f32
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            std = jnp.std(xf, axis=(0, 1, 2), ddof=1)
            bias = -mean
            logs = jnp.log(1.0 / (std + 1e-6))
            self.sow("ddi", "bias", bias, reduce_fn=lambda a, b: b, init_fn=lambda: None)
            self.sow("ddi", "logs", logs, reduce_fn=lambda a, b: b, init_fn=lambda: None)
        dims = x.shape[1] * x.shape[2]
        # logdet always in f32 (param-only); the y-path computes in x.dtype
        # so a bf16 coupling net (GlowConfig.coupling_dtype) stays bf16
        # through its inner actnorms instead of promoting back to f32
        dlogdet = jnp.sum(logs) * dims
        yb, yl = bias.astype(x.dtype), logs.astype(x.dtype)
        if not reverse:
            y = (x + yb) * jnp.exp(yl)
            if logdet is not None:
                logdet = logdet + dlogdet
        else:
            y = x * jnp.exp(-yl) - yb
            if logdet is not None:
                logdet = logdet - dlogdet
        return y, logdet


class BatchNormFlow(nn.Module):
    """RealNVP-style batchnorm bijection (reference Flow/glow_modules.py:56-104).

    Per-position params/stats of shape [H, W, C] (the reference keeps full
    [1, C, H, W] stats). Forward in training mode uses current-batch stats;
    running stats are updated only when applied with ``mutable=['batch_stats']``
    (i.e. outside lax.scan). Reverse always uses running stats.
    """

    spatial_shape: tuple  # (H, W, C)
    momentum: float = 0.0
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, logdet=None, reverse: bool = False, training: bool = True, ddi: bool = False):
        shape = self.spatial_shape
        log_gamma = self.param("log_gamma", nn.initializers.zeros, shape)
        beta = self.param("beta", nn.initializers.zeros, shape)
        r_mean = self.variable("batch_stats", "running_mean", jnp.zeros, shape)
        r_var = self.variable("batch_stats", "running_var", jnp.ones, shape)

        if training and not reverse:
            mean = jnp.mean(x, axis=0)
            var = jnp.mean(jnp.square(x - mean), axis=0) + self.eps
            if self.is_mutable_collection("batch_stats"):
                r_mean.value = r_mean.value * self.momentum + mean * (1 - self.momentum)
                r_var.value = r_var.value * self.momentum + var * (1 - self.momentum)
        else:
            mean, var = r_mean.value, r_var.value

        dlogdet = jnp.sum(log_gamma - 0.5 * jnp.log(var))
        if not reverse:
            y = jnp.exp(log_gamma) * (x - mean) * jax.lax.rsqrt(var) + beta
            if logdet is not None:
                logdet = logdet + dlogdet
        else:
            y = (x - beta) * jnp.exp(-log_gamma) * jnp.sqrt(var) + mean
            if logdet is not None:
                logdet = logdet - dlogdet
        return y, logdet


def conv2d_im2col(x, kernel, bias=None):
    """3x3 (or kxk) same-padding conv as ONE flattened matmul.

    [B,H,W,Cin] x [k,k,Cin,Cout] -> [B,H,W,Cout]. On the deep flow scales
    (4x4/2x2 maps, few output channels) XLA's conv underutilizes the MXU
    (PERF.md "known headroom"); im2col turns the whole conv into a single
    [B*H*W, k*k*Cin] @ [k*k*Cin, Cout] matmul with a large contraction.
    """
    k = kernel.shape[0]
    p = (k - 1) // 2
    b, h, w, cin = x.shape
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    patches = jnp.concatenate(
        [xp[:, dy : dy + h, dx : dx + w, :] for dy in range(k) for dx in range(k)],
        axis=-1,
    )  # [B,H,W,k*k*Cin], block order (dy, dx, cin) == kernel.reshape order
    wmat = kernel.reshape(k * k * cin, kernel.shape[-1])
    y = patches.reshape(b * h * w, k * k * cin) @ wmat
    y = y.reshape(b, h, w, kernel.shape[-1])
    if bias is not None:
        y = y + bias
    return y


class _ConvParams(nn.Module):
    """Bare conv kernel/bias params with nn.Conv's exact naming, for conv
    implementations that consume the weights directly (im2col/fused)."""

    out_channels: int
    kernel: int
    kernel_init: object
    use_bias: bool = True

    @nn.compact
    def __call__(self, cin: int):
        k = self.param("kernel", self.kernel_init,
                       (self.kernel, self.kernel, cin, self.out_channels))
        b = (self.param("bias", nn.initializers.zeros, (self.out_channels,))
             if self.use_bias else None)
        return k, b


class Conv2dZeros(nn.Module):
    """Zero-initialized conv with learned output gain exp(3*logs).

    Reference: Flow/glow_modules.py:106-121.
    """

    out_channels: int
    kernel: int = 3
    impl: str = "conv"  # {conv, im2col}
    dtype: object = None  # compute dtype (params stay f32), e.g. bf16
    # fold the output gain into the conv weights: conv_W(x, b)·e^{3·logs}
    # == conv_{W·g}(x) + b·g with g = e^{3·logs} — exact up to float
    # reassociation, removing a [rows, out_channels] elementwise pass per
    # coupling output layer in both directions (same trick as
    # Conv2dNorm.fold_actnorm; docs/PERF.md round-3 decomposition).
    fold_gain: bool = True

    @nn.compact
    def __call__(self, x):
        p = (self.kernel - 1) // 2
        if self.dtype is not None:
            x = x.astype(self.dtype)
        logs = self.param("logs", nn.initializers.zeros, (self.out_channels,))
        # (bf16 keeps the unfolded path: its f32 output gain doubles as the
        # promotion back to f32, and the knob is documented losing anyway)
        if self.fold_gain and self.impl == "conv" and self.dtype is None:
            kern, bias = _ConvParams(self.out_channels, self.kernel,
                                     nn.initializers.zeros, name="conv")(
                x.shape[-1])
            g = jnp.exp(logs * 3.0)
            return jax.lax.conv_general_dilated(
                x, kern * g, (1, 1), ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias * g
        if self.impl == "im2col":
            kern, bias = _ConvParams(self.out_channels, self.kernel,
                                     nn.initializers.zeros, name="conv")(
                x.shape[-1])
            y = conv2d_im2col(x, kern, bias)
        else:
            y = nn.Conv(
                self.out_channels,
                kernel_size=(self.kernel, self.kernel),
                padding=((p, p), (p, p)),
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name="conv",
            )(x)
        # the f32 gain promotes a bf16 y back to f32 — the flow's affine
        # parameters and logdet math downstream always run f32
        return y * jnp.exp(logs * 3.0)


class Conv2dNorm(nn.Module):
    """Conv (weights ~ N(0, 0.05)) + {actnorm|batchnorm|none}.

    Reference: Flow/glow_modules.py:123-147.
    """

    out_channels: int
    kernel: int = 3
    norm: str = "actnorm"
    impl: str = "conv"  # {conv, im2col}
    dtype: object = None  # compute dtype (params stay f32), e.g. bf16
    # fold the actnorm into the conv weights: (conv(x) + b)*e^logs ==
    # conv_{W*e^logs}(x) + b*e^logs — exact (up to float reassociation),
    # and removes a full [rows, out_channels] elementwise mul+add per
    # layer (fwd AND bwd). The train step is saturated on exactly this
    # per-element work (docs/PERF.md round-3 decomposition: -25..34% on
    # the wide flow scales). ddi passes use the unfolded path (ActNorm
    # must see the raw conv output to compute init stats).
    fold_actnorm: bool = True

    @nn.compact
    def __call__(self, x, ddi: bool = False):
        p = (self.kernel - 1) // 2
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if (self.fold_actnorm and self.norm == "actnorm" and not ddi
                and self.impl == "conv"):
            kern, _ = _ConvParams(self.out_channels, self.kernel,
                                  nn.initializers.normal(stddev=0.05),
                                  use_bias=False, name="conv")(x.shape[-1])
            an = ActNorm(self.out_channels, name="actnorm")
            g = jnp.exp(an.logs)
            # 'flow_w' tag: under RFN.remat_policy='save_flow_full' the
            # folded kernels are saved across the scan remat instead of
            # being re-assembled (one tiny dispatch each) in the backward
            kern = checkpoint_name((kern * g).astype(x.dtype), "flow_w")
            b = (an.bias * g).astype(x.dtype)
            return jax.lax.conv_general_dilated(
                x, kern, (1, 1), ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
        if self.impl == "im2col":
            kern, bias = _ConvParams(self.out_channels, self.kernel,
                                     nn.initializers.normal(stddev=0.05),
                                     use_bias=(self.norm != "actnorm"),
                                     name="conv")(x.shape[-1])
            y = conv2d_im2col(x, kern, bias)
        else:
            y = nn.Conv(
                self.out_channels,
                kernel_size=(self.kernel, self.kernel),
                padding=((p, p), (p, p)),
                use_bias=(self.norm != "actnorm"),
                kernel_init=nn.initializers.normal(stddev=0.05),
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name="conv",
            )(x)
        if self.norm == "actnorm":
            y, _ = ActNorm(self.out_channels, name="actnorm")(y, None, ddi=ddi)
        elif self.norm == "batchnorm":
            # stat-free batch normalization (see nn.layers.NormLayer note)
            mean = jnp.mean(y, axis=(0, 1, 2), keepdims=True)
            var = jnp.var(y, axis=(0, 1, 2), keepdims=True)
            gamma = self.param("bn_scale", nn.initializers.ones, (self.out_channels,))
            bbeta = self.param("bn_bias", nn.initializers.zeros, (self.out_channels,))
            y = (y - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + bbeta
        return y


class InvConv(nn.Module):
    """Invertible 1x1 conv, optionally LU-parameterized.

    Reference: Flow/glow_modules.py:150-221. P and sign(s) live in the
    ``'consts'`` collection (non-trainable). The inverse is computed with
    triangular solves rather than explicit inverses.
    """

    num_channels: int
    lu_decomposed: bool = True
    # interpretation of a 3-d input (GlowConfig.packed_layout):
    # 'sublane' = [B, C, S], 'lanes' = [B, H, C*W]
    packed: str = "sublane"

    @nn.compact
    def __call__(self, x, logdet=None, reverse: bool = False,
                 fold_bias=None, fold_logs=None):
        """When ``fold_bias``/``fold_logs`` are given, the adjacent actnorm
        is folded into the 1x1 matmul — exact up to float reassociation,
        removing the actnorm's elementwise pass over [rows, C] (and its
        remat replay + backward) per GlowStep:

        - forward (actnorm THEN 1x1): ``((x + b)·e^s)·Wᵀ ==
          x·(W·diag(e^s))ᵀ + (b·e^s)·Wᵀ`` (scale W's input columns).
        - reverse (inverse 1x1 THEN inverse actnorm): ``(y·W⁻ᵀ)·e^{-s} - b
          == y·(diag(e^{-s})·W⁻¹)ᵀ - b`` (scale W⁻¹'s output rows).

        The actnorm logdet ``sum(s)·hw`` is accounted here from the params.

        Accepts NHWC ``[B, H, W, C]`` or either packed layout
        (GlowConfig.packed_layout; the ``packed`` field says which):
        channel-sublane ``[B, C, S]`` (utils.numerics.pack_chw) or
        channel-major lanes ``[B, H, C*W]`` (pack_cw) — identical math,
        different physical tiling. In the lanes layout the 1x1 conv is ONE
        block-diagonal ``[C*W, C*W]`` matmul (``kron(W, I_W)``): the MXU
        pass is the same 128-wide tile NHWC pays for anyway (C pads to 128
        lanes), without the relayout.
        """
        c = self.num_channels
        lanes = x.ndim == 3 and self.packed == "lanes"
        packed = x.ndim == 3 and not lanes
        if lanes:
            wp = x.shape[2] // c
            hw = x.shape[1] * wp
        else:
            hw = x.shape[2] if packed else x.shape[1] * x.shape[2]
        if not self.lu_decomposed:
            w = self.param(
                "weight", lambda k, s: nn.initializers.orthogonal()(k, s), (c, c)
            )
            dlogdet = jnp.linalg.slogdet(w)[1] * hw
            weight = jnp.linalg.inv(w) if reverse else w
        else:
            if self.is_initializing():
                w0 = nn.initializers.orthogonal()(self.make_rng("params"), (c, c))
                p0, l0, u0 = jax.scipy.linalg.lu(w0)
                s0 = jnp.diag(u0)
                init = dict(
                    p=p0,
                    sign_s=jnp.sign(s0),
                    lower=l0,
                    log_s=jnp.log(jnp.abs(s0)),
                    upper=jnp.triu(u0, 1),
                )
            else:
                init = dict(p=None, sign_s=None, lower=None, log_s=None, upper=None)
            p = self.variable("consts", "p", lambda: init["p"]).value
            sign_s = self.variable("consts", "sign_s", lambda: init["sign_s"]).value
            lower = self.param("lower", lambda k: init["lower"])
            log_s = self.param("log_s", lambda k: init["log_s"])
            upper = self.param("upper", lambda k: init["upper"])

            l_mask = jnp.tril(jnp.ones((c, c), x.dtype), -1)
            eye = jnp.eye(c, dtype=x.dtype)
            l = lower * l_mask + eye
            u = upper * l_mask.T + jnp.diag(sign_s * jnp.exp(log_s))
            dlogdet = jnp.sum(log_s) * hw
            if reverse:
                u_inv = jax.scipy.linalg.solve_triangular(u, eye, lower=False)
                l_inv = jax.scipy.linalg.solve_triangular(l, eye, lower=True, unit_diagonal=True)
                weight = u_inv @ l_inv @ p.T
            else:
                weight = p @ l @ u

        # 1x1 conv in NHWC == right-matmul by weight^T (maps straight to MXU);
        # packed [B, C, S] contracts over the sublane axis; packed lanes
        # [B, H, C*W] right-multiplies by the block-diagonal kron(W^T, I_W).
        eq = "bcs,dc->bds" if packed else "bhwc,dc->bhwd"

        def mm(xx, w_dc):
            if lanes:
                bd = jnp.kron(w_dc.T, jnp.eye(wp, dtype=xx.dtype))
                return jnp.einsum("bhl,lm->bhm", xx, bd)
            return jnp.einsum(eq, xx, w_dc)

        def vec(v):  # per-channel vector, broadcastable over the layout
            if lanes:
                return jnp.repeat(v, wp)
            return v[:, None] if packed else v

        # 'flow_w' tags: under RFN.remat_policy='save_flow_full' the
        # assembled (LU-multiplied, actnorm-scaled) 1x1 weights are saved
        # across the scan remat instead of re-assembled in the backward
        if fold_bias is not None and not reverse:
            e_s = jnp.exp(fold_logs)
            shift = (fold_bias * e_s) @ weight.T  # shift_d = Σ_c b_c e^{s_c} W[d,c]
            z = mm(x, checkpoint_name(weight * e_s[None, :], "flow_w")) + vec(shift)
            dlogdet = dlogdet + jnp.sum(fold_logs) * hw
        elif fold_bias is not None:
            # weight is already W⁻¹ here; x_d = e^{-s_d}(y·W⁻ᵀ)_d - b_d
            z = mm(x, weight * jnp.exp(-fold_logs)[:, None]) - vec(fold_bias)
            dlogdet = dlogdet + jnp.sum(fold_logs) * hw
        else:
            z = mm(x, checkpoint_name(weight, "flow_w"))
        if logdet is not None:
            logdet = logdet - dlogdet if reverse else logdet + dlogdet
        return z, logdet


class AffineCoupling(nn.Module):
    """Conditional affine coupling with 4 clamp variants.

    forward: z2 = (z2 + shift) * exp(clamp(s)); logdet += sum(clamp(s)).
    Reference: Flow/glow_modules.py:223-291 (note the reference's
    shift-then-scale order, kept here).
    """

    x_channels: int
    hidden_units: int = 256
    non_lin: str = "relu"
    clamp_type: str = "realnvp"
    norm: str = "actnorm"  # norm used inside the coupling net convs
    impl: str = "conv"  # {conv, im2col, auto}
    # compute dtype for the coupling NN only (e.g. jnp.bfloat16). The net is
    # a free-form conditioner, so reduced precision there changes the
    # bijection deterministically (f/g stay exact inverses; logdet math and
    # the affine transform itself always run f32). GlowConfig.coupling_dtype.
    net_dtype: object = None
    fold: bool = True  # GlowConfig.fold_weights (weight-fold family)
    spatial: tuple = ()  # (H, W), required for the packed layouts
    # interpretation of a 3-d input (GlowConfig.packed_layout):
    # 'sublane' = [B, C, S], 'lanes' = [B, H, C*W]
    packed: str = "sublane"

    @nn.compact
    def __call__(self, x, condition, logdet=None, reverse: bool = False, ddi: bool = False):
        # Packed input (GlowConfig.packed_layout): z1/z2 split on the
        # packed channel axis (contiguous lane slices in 'lanes' mode);
        # only the coupling-net convs run NHWC (their transposes fuse into
        # the concat / affine epilogue).
        lanes = x.ndim == 3 and self.packed == "lanes"
        packed = x.ndim == 3 and not lanes
        if lanes:
            from ..utils.numerics import unpack_cw

            h_sp, w_sp = self.spatial
            c = x.shape[2] // w_sp
            half = (c // 2) * w_sp
            z1, z2 = x[..., :half], x[..., half:]
            z1_nhwc = unpack_cw(z1, c // 2)
        elif packed:
            from ..utils.numerics import unpack_chw

            h_sp, w_sp = self.spatial
            c = x.shape[1]
            z1, z2 = x[:, : c // 2], x[:, c // 2 :]
            z1_nhwc = unpack_chw(z1, h_sp, w_sp)
        else:
            z1, z2 = split_feature(x, "split")
            z1_nhwc = z1
        assert condition.shape[1:3] == z1_nhwc.shape[1:3], \
            "condition/x spatial mismatch"
        impl = self.impl
        if impl not in ("conv", "im2col"):
            # 'auto' resolves at the GlowStep level (fused Pallas kernel on
            # the deep scales, scripts/bench_glowstep.py); here — i.e. for
            # DDI/init passes and non-eligible configs — XLA's conv wins at
            # every scale (2026-08 v5e grad-step measurements: im2col 1.1-5x
            # slower than conv across 16x16..2x2).
            impl = "conv"
        h = jnp.concatenate([z1_nhwc, condition], axis=-1)
        nd = self.net_dtype
        h = Conv2dNorm(self.hidden_units, 3, norm=self.norm, impl=impl,
                       dtype=nd, fold_actnorm=self.fold, name="net0")(h, ddi=ddi)
        h = act(h, self.non_lin)
        h = Conv2dNorm(self.hidden_units, 1, norm=self.norm, impl=impl,
                       dtype=nd, fold_actnorm=self.fold, name="net1")(h, ddi=ddi)
        h = act(h, self.non_lin)
        out = Conv2dZeros(self.x_channels, impl=impl, dtype=nd,
                          fold_gain=self.fold, name="net2")(h)
        out = out.astype(jnp.float32)
        shift, log_scale = split_feature(out, "cross")

        if self.clamp_type == "glow":
            s = jnp.log(jax.nn.sigmoid(log_scale + 2.0))
        elif self.clamp_type == "softclamp":
            s = 2.5 * 0.636 * jnp.arctan(log_scale / 2.5)
        elif self.clamp_type == "realnvp":
            scale = self.param("scale", nn.initializers.zeros, (self.x_channels // 2,))
            scale_shift = self.param(
                "scale_shift", nn.initializers.zeros, (self.x_channels // 2,)
            )
            s = scale * jnp.tanh(log_scale) + scale_shift
        elif self.clamp_type == "none":
            s = log_scale
        else:
            raise ValueError(f"unknown clamp type: {self.clamp_type}")

        from ..ops.pallas import coupling_transform

        if lanes:
            from ..utils.numerics import pack_cw

            shift, s = pack_cw(shift), pack_cw(s)
        elif packed:
            from ..utils.numerics import pack_chw

            # the transpose into packed layout fuses with the clamp chain
            # reading the conv output, so 'out' is read once
            shift, s = pack_chw(shift), pack_chw(s)
        z2, ld = coupling_transform(z2, shift, s, reverse)
        if logdet is not None:
            logdet = logdet + ld if not reverse else logdet - ld
        return jnp.concatenate([z1, z2], axis=1 if packed else -1), logdet


class Split2d(nn.Module):
    """Multiscale split with learned (optionally conditional) Gaussian p(z2|z1, cond).

    Reference: Flow/glow_modules.py:312-369. forward: drop z2, add its
    log-likelihood to the objective. reverse: draw z2 ~ N(mean, sigma * T).
    """

    x_channels: int  # channels of x *before* the split
    make_conditional: bool = True
    clamp_function: str = "softplus"
    norm: str = "actnorm"
    non_lin: str = "relu"
    fold: bool = True  # GlowConfig.fold_weights (weight-fold family)

    def _clamp(self, log_scale):
        if self.clamp_function == "softplus":
            return jax.nn.softplus(log_scale) + 1e-8
        elif self.clamp_function == "exp":
            return jnp.exp(log_scale)
        raise ValueError("split2d clamp must be in {softplus, exp}")

    @nn.compact
    def __call__(
        self,
        x,
        condition=None,
        logdet=None,
        reverse: bool = False,
        rng=None,
        temperature: float = 1.0,
        ddi: bool = False,
    ):
        if not reverse:
            z1, z2 = split_feature(x, "split")
        else:
            z1 = x

        if self.make_conditional:
            c = condition.shape[-1]
            cond = Conv2dNorm(c, 3, norm=self.norm,
                              fold_actnorm=self.fold, name="cond0")(condition, ddi=ddi)
            cond = act(cond, self.non_lin)
            cond = Conv2dNorm(c, 1, norm=self.norm,
                              fold_actnorm=self.fold, name="cond1")(cond, ddi=ddi)
            cond = act(cond, self.non_lin)
            h = jnp.concatenate([z1, cond], axis=-1)
        else:
            h = z1

        out = Conv2dZeros(self.x_channels, fold_gain=self.fold, name="conv")(h)
        mean, log_scale = split_feature(out, "cross")
        sigma = self._clamp(log_scale)

        if not reverse:
            if logdet is not None:
                logdet = logdet + batch_reduce(normal_log_prob(z2, mean, sigma))
            return z1, logdet
        else:
            eps = jax.random.normal(rng, mean.shape, dtype=mean.dtype)
            z2 = mean + sigma * temperature * eps
            return jnp.concatenate([z1, z2], axis=-1), logdet
