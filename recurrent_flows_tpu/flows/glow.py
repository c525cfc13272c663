"""Multiscale conditional Glow (NHWC, flax.linen).

TPU-native rebuild of reference Flow/glow.py:10-160 (GlowStep, ListGlow).
Scales/steps are static Python structure (traced once under jit); squeeze is
a reshape/transpose; all per-channel ops act on the last axis.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..config import GlowConfig, packed_mode
from ..nn.layers import act
from ..utils.numerics import (
    batch_reduce,
    normal_log_prob,
    pack_chw,
    pack_cw,
    split_feature,
    squeeze2d,
    unpack_chw,
    unpack_cw,
    unsqueeze2d,
)
from .modules import (
    ActNorm,
    AffineCoupling,
    BatchNormFlow,
    Conv2dNorm,
    Conv2dZeros,
    InvConv,
    Split2d,
)


def prep_glowstep_params(p, consts, cfg, c: int, reverse: bool):
    """Assemble kernel-ready ``GlowStepParams`` from one GlowStep's
    param/const subtrees (p = {'norm','invconv','affine'}).

    LU assembly for the 1x1 (inverted via triangular solves for the
    reverse direction), Conv2dZeros exp(3*logs) gain folding, and the
    'cross' split pre-permutation of the last conv all happen here in
    jnp — O(C^2) one-offs XLA fuses for free (and LICM-hoists out of
    sampling scans, docs/PERF.md). Returns (params, static_logdet_per_px)
    where the static term is sum(actnorm logs) + sum(1x1 log_s); the
    caller multiplies by H*W and signs it for the direction.
    """
    from ..ops.pallas.glowstep import GlowStepParams

    inv, invc = p["invconv"], consts["invconv"]
    l_mask = jnp.tril(jnp.ones((c, c), jnp.float32), -1)
    eye = jnp.eye(c, dtype=jnp.float32)
    lower = inv["lower"] * l_mask + eye
    upper = inv["upper"] * l_mask.T + jnp.diag(
        invc["sign_s"] * jnp.exp(inv["log_s"])
    )
    if reverse:
        u_inv = jax.scipy.linalg.solve_triangular(upper, eye, lower=False)
        l_inv = jax.scipy.linalg.solve_triangular(
            lower, eye, lower=True, unit_diagonal=True
        )
        weight = u_inv @ l_inv @ invc["p"].T
    else:
        weight = invc["p"] @ lower @ upper
    aff = p["affine"]
    u = cfg.n_units_affine
    wa = aff["net0"]["conv"]["kernel"].reshape(9, -1, u)
    wb = aff["net1"]["conv"]["kernel"].reshape(u, u)
    e3 = jnp.exp(3.0 * aff["net2"]["logs"])
    perm = jnp.concatenate(
        [jnp.arange(0, c, 2), jnp.arange(1, c, 2)]
    )  # 'cross' split pre-permutation: evens (shift) then odds (scale)
    wc = (aff["net2"]["conv"]["kernel"] * e3)[..., perm].reshape(9, u, c)
    bias_c = (aff["net2"]["conv"]["bias"] * e3)[perm]
    half = c // 2
    if cfg.clamp_type == "realnvp":
        cl_scale, cl_shift = aff["scale"], aff["scale_shift"]
    else:
        cl_scale = cl_shift = jnp.zeros((half,), jnp.float32)
    params = GlowStepParams(
        an_bias=p["norm"]["bias"],
        an_logs=p["norm"]["logs"],
        w1x1=weight.T,
        wa=wa,
        ana_bias=aff["net0"]["actnorm"]["bias"],
        ana_logs=aff["net0"]["actnorm"]["logs"],
        wb=wb,
        anb_bias=aff["net1"]["actnorm"]["bias"],
        anb_logs=aff["net1"]["actnorm"]["logs"],
        wc=wc,
        bias_c=bias_c,
        clamp_scale=cl_scale,
        clamp_shift=cl_shift,
    )
    static_ld_px = jnp.sum(p["norm"]["logs"]) + jnp.sum(inv["log_s"])
    return params, static_ld_px


def _conv_same(x, kern):
    """kxk same-padding NHWC conv (stride 1)."""
    k = kern.shape[0]
    p = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, kern, (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def prep_dual_params(p, consts, cfg, c: int):
    """Fold one GlowStep's params into dual-stream-executor tensors.

    Same algebra as the module path's weight-fold family (InvConv /
    Conv2dNorm / Conv2dZeros docstrings), laid out for a (z1, z2) carry:

      * ``w_top``/``w_bot`` [half, C]: the actnorm-folded 1x1 as
        ``y = z1 @ w_top + z2 @ w_bot + shift`` (W's input columns scaled
        by e^s, split by input half; ``shift = (b·e^s)·Wᵀ``).
      * ``k0_z``/``k0_c``: net0's actnorm-folded 3x3 kernel split on its
        input axis — ``conv([z1|cond]) == conv(z1, k0_z) + conv(cond, k0_c)``
        (no per-step input concat).
      * ``k2p``/``b2p``: net2's gain-folded kernel with the 'cross'
        pre-permutation (evens→shift, odds→scale as contiguous halves).

    Returns (tensors dict, static_logdet_per_px).
    """
    half = c // 2
    inv = p["invconv"]
    if cfg.lu_decomposed:
        invc = consts["invconv"]
        l_mask = jnp.tril(jnp.ones((c, c), jnp.float32), -1)
        eye = jnp.eye(c, dtype=jnp.float32)
        lower = inv["lower"] * l_mask + eye
        upper = inv["upper"] * l_mask.T + jnp.diag(
            invc["sign_s"] * jnp.exp(inv["log_s"])
        )
        weight = invc["p"] @ lower @ upper  # [out, in]
        static_1x1 = jnp.sum(inv["log_s"])
    else:
        weight = inv["weight"]
        static_1x1 = jnp.linalg.slogdet(weight)[1]
    e_s = jnp.exp(p["norm"]["logs"])
    w_cd = (weight * e_s[None, :]).T  # y = x @ w_cd (input cols scaled)
    shift = (p["norm"]["bias"] * e_s) @ weight.T
    aff = p["affine"]
    g0 = jnp.exp(aff["net0"]["actnorm"]["logs"])
    k0 = aff["net0"]["conv"]["kernel"] * g0
    g1 = jnp.exp(aff["net1"]["actnorm"]["logs"])
    w1 = aff["net1"]["conv"]["kernel"][0, 0] * g1
    e3 = jnp.exp(3.0 * aff["net2"]["logs"])
    perm = jnp.concatenate([jnp.arange(0, c, 2), jnp.arange(1, c, 2)])
    k2p = (aff["net2"]["conv"]["kernel"] * e3)[..., perm]
    b2p = (aff["net2"]["conv"]["bias"] * e3)[perm]
    t = dict(
        w_top=w_cd[:half], w_bot=w_cd[half:], shift=shift,
        k0_z=k0[:, :, :half, :], k0_c=k0[:, :, half:, :],
        b0=aff["net0"]["actnorm"]["bias"] * g0,
        w1=w1, b1=aff["net1"]["actnorm"]["bias"] * g1,
        k2p=k2p, b2p=b2p,
    )
    if cfg.clamp_type == "realnvp":
        t["cl_scale"], t["cl_shift"] = aff["scale"], aff["scale_shift"]
    return t, jnp.sum(p["norm"]["logs"]) + static_1x1


class GlowStep(nn.Module):
    """norm -> invertible 1x1 conv -> conditional affine coupling.

    Reference: Flow/glow.py:10-41. ``spatial_shape`` is only needed when
    flow_norm='batchnorm' (per-position stats).
    """

    channels: int
    cfg: GlowConfig
    spatial_shape: tuple = ()

    def _fused_eligible(self, x, ddi: bool, reverse: bool) -> bool:
        cfg = self.cfg
        impl = getattr(cfg, "coupling_impl", "conv")
        if impl == "fused":
            max_hw = 256  # forced: any scale the kernel supports
        else:
            # 'auto' resolves to XLA conv in ALL cases — measured end-to-end
            # on v5e, thesis config (scripts/bench_prodstep.py):
            #   train loss+grad: conv 112.0ms | fused@4x4/2x2 122.5ms
            #     (the remat'd scan reruns the kernel's forward, and its
            #      jnp-structured VJP loses to XLA's conv bwd)
            #   sampling rollout: conv 1.94ms | fused@deep 3.27ms
            #     (2 pallas dispatches x 20 deep steps dominate at B=30)
            # The kernel's ~2x deep-scale win is real only at large batched
            # rows (BT>=270 microbench, docs/PERF.md) — force it with
            # coupling_impl='fused' for such workloads.
            return False
        return (
            x.ndim == 4  # the kernel is NHWC; packed [B,C,S] input uses jnp
            and cfg.flow_norm == "actnorm"
            and cfg.lu_decomposed
            and getattr(cfg, "coupling_dtype", None) is None  # kernel is f32
            # the kernel's coupling net hardcodes relu; a leakyrelu config
            # must fall back to the module path or it would silently compute
            # a different function than the checkpoint was trained with
            and cfg.non_lin == "relu"
            and not ddi
            and not self.is_initializing()
            and x.shape[1] * x.shape[2] <= max_hw
        )

    def _fused(self, x, condition, logdet, reverse: bool):
        """Whole-step Pallas kernel (ops/pallas/glowstep.py). Params are
        read from this module's bound scope — the tree is created by the
        normal path at init, so checkpoints are impl-independent."""
        from ..ops.pallas.glowstep import glowstep_fused

        cfg = self.cfg
        hw = x.shape[1] * x.shape[2]
        params, static_ld_px = prep_glowstep_params(
            self.variables["params"], self.variables["consts"], cfg,
            self.channels, reverse,
        )
        y, dyn_ld = glowstep_fused(x, condition, params, cfg.clamp_type, reverse)
        if logdet is not None:
            total = dyn_ld + static_ld_px * hw
            logdet = logdet - total if reverse else logdet + total
        return y, logdet

    @nn.compact
    def __call__(self, x, condition, logdet=None, reverse: bool = False,
                 training: bool = True, ddi: bool = False):
        cfg = self.cfg
        if self._fused_eligible(x, ddi, reverse):
            return self._fused(x, condition, logdet, reverse)
        if x.ndim == 3:
            # packed layout ('sublane' [B,C,S] or 'lanes' [B,H,C*W]): only
            # reachable via the fold path (ListGlow gates packing on
            # actnorm + fold_weights + not ddi)
            assert cfg.flow_norm == "actnorm" and not ddi and \
                getattr(cfg, "fold_weights", True), \
                "packed layout requires actnorm + fold_weights, no DDI"
        if cfg.flow_norm == "batchnorm":
            norm = BatchNormFlow(
                self.spatial_shape, momentum=cfg.batchnorm_momentum, name="norm"
            )
            norm_kwargs = dict(training=training)
        else:
            norm = ActNorm(self.channels, name="norm")
            norm_kwargs = dict(ddi=ddi)
        impl = getattr(cfg, "coupling_impl", "conv")
        if impl == "im2col":
            raise ValueError(
                "coupling_impl='im2col' was removed: it measured slower than "
                "XLA conv at every scale (docs/PERF.md). Use 'auto'/'conv', "
                "or 'fused' for large batched rows through deep scales.")
        pk = packed_mode(cfg) or "sublane"
        invconv = InvConv(self.channels, lu_decomposed=cfg.lu_decomposed,
                          packed=pk, name="invconv")
        affine = AffineCoupling(
            self.channels,
            hidden_units=cfg.n_units_affine,
            non_lin=cfg.non_lin,
            clamp_type=cfg.clamp_type,
            norm=getattr(cfg, "coupling_norm", "actnorm"),
            impl=impl,
            net_dtype=(jnp.bfloat16
                       if getattr(cfg, "coupling_dtype", None) == "bfloat16"
                       else None),
            fold=getattr(cfg, "fold_weights", True),
            spatial=tuple(self.spatial_shape[:2]),
            packed=pk,
            name="affine",
        )
        fold_step = getattr(cfg, "fold_weights", True)
        if not reverse:
            if cfg.flow_norm == "actnorm" and not ddi and fold_step:
                # fold the step actnorm into the 1x1 matmul (forward/training
                # path only — exact, see InvConv docstring). Reading the
                # setup-style params registers them, keeping the tree
                # identical to the unfolded/reverse path. DDI must run the
                # real actnorm to normalize + sow its init statistics.
                x, logdet = invconv(x, logdet, reverse=False,
                                    fold_bias=norm.bias, fold_logs=norm.logs)
            else:
                x, logdet = norm(x, logdet, reverse=False, **norm_kwargs)
                x, logdet = invconv(x, logdet, reverse=False)
            x, logdet = affine(x, condition, logdet, reverse=False, ddi=ddi)
        else:
            x, logdet = affine(x, condition, logdet, reverse=True)
            if cfg.flow_norm == "actnorm" and not ddi and fold_step:
                # inverse actnorm folded into the inverse 1x1 (row-scaled
                # solve result + constant shift — see InvConv docstring)
                x, logdet = invconv(x, logdet, reverse=True,
                                    fold_bias=norm.bias, fold_logs=norm.logs)
            else:
                x, logdet = invconv(x, logdet, reverse=True)
                x, logdet = norm(x, logdet, reverse=True, **norm_kwargs)
        return x, logdet


class ListGlow(nn.Module):
    """Multiscale conditional Glow with a learned conditional base prior.

    L x [squeeze -> K x GlowStep -> conditional Split2d], final latent prior
    N(mean, exp(log_scale)) parameterized from ``base_condition``.
    Reference: Flow/glow.py:43-160.
    """

    in_channels: int
    image_size: int  # input H (== W)
    cfg: GlowConfig

    def setup(self):
        cfg = self.cfg
        c = self.in_channels
        hw = self.image_size
        steps, splits = [], []
        for l in range(cfg.L):
            c *= 4
            hw //= 2
            steps.append(
                tuple(
                    GlowStep(c, cfg, spatial_shape=(hw, hw, c), name=f"scale{l}_step{k}")
                    for k in range(cfg.K)
                )
            )
            if l < cfg.L - 1:
                splits.append(
                    Split2d(
                        c,
                        make_conditional=cfg.make_conditional,
                        clamp_function=cfg.split2d_act,
                        fold=getattr(cfg, "fold_weights", True),
                        name=f"split{l}",
                    )
                )
                c //= 2
        self.steps = tuple(steps)
        self.splits = tuple(splits)
        self.final_channels = c
        self.final_hw = hw
        if cfg.learn_prior:
            fw = getattr(cfg, "fold_weights", True)
            self.prior_conv0 = Conv2dNorm(cfg.n_units_prior, 3, norm=cfg.base_norm,
                                          fold_actnorm=fw, name="prior0")
            self.prior_conv1 = Conv2dNorm(cfg.n_units_prior // 2, 3, norm=cfg.base_norm,
                                          fold_actnorm=fw, name="prior1")
            self.prior_out = Conv2dZeros(2 * c, fold_gain=fw, name="prior_out")

    # -- base prior -------------------------------------------------------

    def base_params(self, base_condition, batch: int, ddi: bool = False):
        """(mean, log_scale) of the base distribution p(z | base_condition)."""
        cfg = self.cfg
        if cfg.learn_prior:
            h = self.prior_conv0(base_condition, ddi=ddi)
            h = act(h, cfg.non_lin)
            h = self.prior_conv1(h, ddi=ddi)
            h = act(h, cfg.non_lin)
            out = self.prior_out(h)
            mean, log_scale = split_feature(out, "split")
        else:
            shape = (batch, self.final_hw, self.final_hw, self.final_channels)
            mean = jnp.zeros(shape)
            log_scale = jnp.zeros(shape)
        return mean, log_scale

    # -- bijection --------------------------------------------------------

    def _packed(self, ddi: bool) -> str:
        """Which packed layout ('' for NHWC) the K GlowSteps of each scale
        run in (GlowConfig.packed_layout: 'lanes' = [B, H, C*W],
        'sublane' = [B, C, H*W]). DDI, batchnorm flows, unfolded runs, and
        the explicit fused-kernel request stay NHWC."""
        cfg = self.cfg
        if not (
            cfg.flow_norm == "actnorm"
            and getattr(cfg, "fold_weights", True)
            and getattr(cfg, "coupling_impl", "conv") != "fused"
            and not ddi
        ):
            return ""
        return packed_mode(cfg)

    def _chain_eligible(self, x, ddi: bool, reverse: bool, packed: str) -> bool:
        """Whole-scale chain kernel gate (GlowConfig.chain_impl): one
        pallas_call runs the scale's K GlowSteps with x carried in VMEM
        (ops/pallas/glowchain.py). Same support envelope as the per-step
        fused kernel: small-spatial NHWC f32 actnorm/LU/relu scales."""
        cfg = self.cfg
        mode = getattr(cfg, "chain_impl", "off")
        if mode == "off" or (mode == "sample" and not reverse):
            return False
        return (
            not packed
            and x.ndim == 4
            and cfg.flow_norm == "actnorm"
            and cfg.lu_decomposed
            and getattr(cfg, "coupling_dtype", None) is None
            and cfg.non_lin == "relu"
            and not ddi
            and not self.is_initializing()
            # <=256 (8x8 and deeper after the 16x16 boundary): 32x32 was
            # tried with batch tiling (no halos needed) and measured a
            # DISASTER — prod rollout 49.9 ms vs 27.1 baseline; XLA's
            # native conv beats the kernel's shifted-matmul formulation
            # at 30k rows (docs/PERF.md round 3e)
            and x.shape[1] * x.shape[2] <= 256
        )

    def _chain(self, l: int, x, condition, logdet, reverse: bool):
        """Run scale ``l``'s full K-step chain through the glowchain
        kernel. Params are prepped per step and stacked [K, ...] in
        execution order (reversed for the inverse direction)."""
        from ..ops.pallas.glowchain import glowchain_fused

        cfg = self.cfg
        c = x.shape[-1]
        hw = x.shape[1] * x.shape[2]
        order = range(cfg.K - 1, -1, -1) if reverse else range(cfg.K)
        preps = [
            prep_glowstep_params(
                self.variables["params"][f"scale{l}_step{k}"],
                self.variables["consts"][f"scale{l}_step{k}"],
                cfg, c, reverse,
            )
            for k in order
        ]
        ps = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves), *(pr for pr, _ in preps)
        )
        y, dyn_ld = glowchain_fused(x, condition, ps, cfg.clamp_type, reverse)
        if logdet is not None:
            static = sum(s for _, s in preps) * hw
            total = dyn_ld + static
            logdet = logdet - total if reverse else logdet + total
        return y, logdet

    def _dual_eligible(self, ddi: bool, packed: str) -> bool:
        """Dual-stream scale executor gate (GlowConfig.dual_stream): the
        f-direction only, NHWC, with the full weight-fold family active.
        DDI and init must run the module path (param creation / stats).
        Takes precedence over chain_impl='all' in f (documented in
        GlowConfig; the chain kernel still serves the g direction)."""
        cfg = self.cfg
        return (
            getattr(cfg, "dual_stream", False)
            and not packed
            and cfg.flow_norm == "actnorm"
            and getattr(cfg, "coupling_norm", "actnorm") == "actnorm"
            and getattr(cfg, "fold_weights", True)
            and getattr(cfg, "coupling_impl", "conv") in ("auto", "conv")
            and getattr(cfg, "coupling_dtype", None) is None
            and not ddi
            and not self.is_initializing()
        )

    def _dual_scale(self, l: int, z, condition, logdet):
        """Run scale ``l``'s K steps with (z1, z2) carried separately.

        Removes per step: the output concat, the [z1|condition] input
        concat (conv split on its input axis), and the strided 'cross'
        gathers; the K coupling logdet reductions merge into one
        per-scale reduction. Equivalent math to the module path up to
        float reassociation (tests/test_flows.py::test_dual_stream_*).
        Reference hot loop: Flow/glow.py:105-117.
        """
        cfg = self.cfg
        c = z.shape[-1]
        half = c // 2
        hw = z.shape[1] * z.shape[2]
        assert condition.shape[1:3] == z.shape[1:3], "condition/x spatial mismatch"
        z1, z2 = z[..., :half], z[..., half:]
        s_parts = []
        static_px = 0.0
        # the 'consts' collection only exists under lu_decomposed (InvConv's
        # P/sign_s); the non-LU branch of prep_dual_params never reads it
        consts = self.variables.get("consts", {})
        for k in range(cfg.K):
            t, st = prep_dual_params(
                self.variables["params"][f"scale{l}_step{k}"],
                consts.get(f"scale{l}_step{k}", {}),
                cfg, c,
            )
            y = (
                jnp.einsum("bhwc,cd->bhwd", z1, t["w_top"])
                + jnp.einsum("bhwc,cd->bhwd", z2, t["w_bot"])
                + t["shift"]
            )
            z1, z2 = y[..., :half], y[..., half:]
            h = _conv_same(z1, t["k0_z"]) + _conv_same(condition, t["k0_c"]) + t["b0"]
            h = act(h, cfg.non_lin)
            h = jnp.einsum("bhwu,uv->bhwv", h, t["w1"]) + t["b1"]
            h = act(h, cfg.non_lin)
            out = _conv_same(h, t["k2p"]) + t["b2p"]
            shift_c, log_scale = out[..., :half], out[..., half:]
            if cfg.clamp_type == "glow":
                s = jnp.log(jax.nn.sigmoid(log_scale + 2.0))
            elif cfg.clamp_type == "softclamp":
                s = 2.5 * 0.636 * jnp.arctan(log_scale / 2.5)
            elif cfg.clamp_type == "realnvp":
                s = t["cl_scale"] * jnp.tanh(log_scale) + t["cl_shift"]
            elif cfg.clamp_type == "none":
                s = log_scale
            else:
                raise ValueError(f"unknown clamp type: {cfg.clamp_type}")
            z2 = (z2 + shift_c) * jnp.exp(s)
            s_parts.append(s)
            static_px = static_px + st
            z1 = checkpoint_name(z1, "flow_x")
            z2 = checkpoint_name(z2, "flow_x")
        z = jnp.concatenate([z1, z2], axis=-1)
        if logdet is not None:
            dyn = batch_reduce(jnp.stack(s_parts, axis=1))  # one reduction
            logdet = logdet + dyn + static_px * hw
        return z, logdet

    def f(self, x, conditions: Sequence, logdet, training: bool = True, ddi: bool = False):
        """x -> z. Reference Flow/glow.py:105-117."""
        cfg = self.cfg
        packed = self._packed(ddi)
        z = x
        dual = self._dual_eligible(ddi, packed)
        for l in range(cfg.L):
            z = squeeze2d(z)
            h, w, c = z.shape[1], z.shape[2], z.shape[3]
            if dual:
                z, logdet = self._dual_scale(l, z, conditions[l], logdet)
                if l < cfg.L - 1:
                    z, logdet = self.splits[l](
                        z, conditions[l], logdet, reverse=False, ddi=ddi
                    )
                # tag unconditionally (matching the chain/module paths) so
                # 'save_flow_x' remat saves the final scale's concat too
                z = checkpoint_name(z, "flow_x")
                continue
            if self._chain_eligible(z, ddi, False, packed):
                z, logdet = self._chain(l, z, conditions[l], logdet, False)
                if l < cfg.L - 1:
                    z, logdet = self.splits[l](
                        z, conditions[l], logdet, reverse=False, ddi=ddi
                    )
                z = checkpoint_name(z, "flow_x")
                continue
            if packed:
                z = pack_cw(z) if packed == "lanes" else pack_chw(z)
            for k in range(cfg.K):
                z, logdet = self.steps[l][k](
                    z, conditions[l], logdet, reverse=False, training=training, ddi=ddi
                )
                # tag the step carry for selective remat: under the
                # 'save_flow_x' policy (models/rfn.py) the backward reuses
                # these instead of replaying the serial chain. A no-op
                # identity under any other policy / no remat.
                z = checkpoint_name(z, "flow_x")
            if packed:
                z = unpack_cw(z, c) if packed == "lanes" else unpack_chw(z, h, w)
            if l < cfg.L - 1:
                z, logdet = self.splits[l](
                    z, conditions[l], logdet, reverse=False, ddi=ddi
                )
                z = checkpoint_name(z, "flow_x")
        return z, logdet

    def g(self, z, conditions: Sequence, rng, temperature: float = 1.0,
          training: bool = True):
        """z -> x. Reference Flow/glow.py:90-102."""
        cfg = self.cfg
        packed = self._packed(ddi=False)
        x = z
        for l in reversed(range(cfg.L)):
            if l < cfg.L - 1:
                rng, sub = jax.random.split(rng)
                x, _ = self.splits[l](
                    x, conditions[l], None, reverse=True, rng=sub, temperature=temperature
                )
            h, w, c = x.shape[1], x.shape[2], x.shape[3]
            if self._chain_eligible(x, False, True, packed):
                x, _ = self._chain(l, x, conditions[l], None, True)
                x = unsqueeze2d(x)
                continue
            if packed:
                x = pack_cw(x) if packed == "lanes" else pack_chw(x)
            for k in reversed(range(cfg.K)):
                x, _ = self.steps[l][k](
                    x, conditions[l], None, reverse=True, training=training
                )
            if packed:
                x = unpack_cw(x, c) if packed == "lanes" else unpack_chw(x, h, w)
            x = unsqueeze2d(x)
        return x

    # -- densities --------------------------------------------------------

    def log_prob(self, x, conditions, base_condition, rng=None, logdet=0.0,
                 training: bool = True, ddi: bool = False, dequantize: bool = True):
        """Returns (z, nll[B]). Reference Flow/glow.py:119-141.

        Uniform dequantization noise is added when ``dequantize`` (requires
        ``rng``); the -log(n_bins)*D correction is always applied, matching
        the reference's uniform_binning_correction.
        """
        cfg = self.cfg
        b = x.shape[0]
        n_bins = 2.0 ** cfg.n_bits
        dims = x.shape[1] * x.shape[2] * x.shape[3]
        obj = jnp.asarray(logdet, jnp.float32) * jnp.ones((b,), jnp.float32)
        if dequantize:
            x = x + jax.random.uniform(rng, x.shape, x.dtype, 0.0, 1.0 / n_bins)
        obj = obj - math.log(n_bins) * dims
        z, obj = self.f(x, conditions, obj, training=training, ddi=ddi)
        mean, log_scale = self.base_params(base_condition, b, ddi=ddi)
        obj = obj + batch_reduce(normal_log_prob(z, mean, jnp.exp(log_scale)))
        return z, -obj

    def sample(self, z, conditions, base_condition, rng, num_samples: int = 32,
               temperature: float = 0.8, eval_params: bool = False,
               training: bool = True):
        """Draw x (optionally from a provided z). Reference Flow/glow.py:143-160."""
        rng_base, rng_g = jax.random.split(rng)
        batch = base_condition.shape[0] if base_condition is not None else num_samples
        mean, log_scale = self.base_params(base_condition, batch)
        if z is None:
            std = jnp.exp(log_scale) * temperature
            z = mean + std * jax.random.normal(rng_base, mean.shape, mean.dtype)
        x = self.g(z, conditions, rng_g, temperature=temperature, training=training)
        if eval_params:
            return x, (mean, jnp.exp(log_scale))
        return x

    def __call__(self, x, conditions, base_condition, rng):
        """Init-only entry: touches every parameter once (f + prior + g)."""
        z, nll = self.log_prob(x, conditions, base_condition, rng)
        _ = self.g(z, conditions, rng)
        return nll
