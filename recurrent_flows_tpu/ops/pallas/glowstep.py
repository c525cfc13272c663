"""Fully fused GlowStep Pallas kernel (norm + 1x1 + coupling incl. convs).

One `pallas_call` computes an entire GlowStep — ActNorm, invertible 1x1
conv, and the conditional affine coupling INCLUDING its two 3x3 convs and
the 1x1 hidden conv — forward or inverse, with the exact per-sample
logdet. Everything stays in VMEM between the matmuls; the 3x3 convs are
computed as 9 shifted [rows, Cin] @ [Cin, Cout] MXU matmuls accumulated in
a VMEM scratch (the flattened-matmul lever for the deep small-spatial
scales, PERF.md "known headroom").

Scope: small spatial maps (H*W <= 256 — the production config's
8x8/4x4/2x2 scales). The shallow large-spatial scales keep XLA's conv
path, which is already roofline-bound there (PERF.md).

Parameter prep (LU assembly for the 1x1, actnorm-gain folding, 'cross'
channel permutation of the last conv) happens OUTSIDE the kernel in jnp —
those are O(C^2) one-offs XLA fuses for free. The custom VJP recomputes
the step with the jnp reference implementation (rematerialization), so
gradients are exact without a handwritten backward.

Reference math: Flow/glow_modules.py (ActNorm :40-45, InvConv :209-216,
AffineCoupling :270-288); this file's jnp reference `glowstep_jnp` is the
oracle both for the kernel and for the VJP.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


class GlowStepParams(NamedTuple):
    """Prepped (kernel-ready) parameters for one GlowStep.

    All conv kernels are pre-flattened/permuted; `w1x1` is W^T for the
    forward direction and (W^-1)^T for the inverse, assembled from the LU
    factors outside; `wc`/`bias_c` carry the Conv2dZeros exp(3*logs) gain
    folded in and the 'cross' split pre-permuted so the first C/2 output
    channels are the shift and the last C/2 the raw log_scale.
    """

    an_bias: jax.Array  # [C]
    an_logs: jax.Array  # [C]
    w1x1: jax.Array  # [C, C] (transposed, direction-specific)
    wa: jax.Array  # [9, CA, U]  (3x3 conv 1, CA = C/2 + Cc)
    ana_bias: jax.Array  # [U]
    ana_logs: jax.Array  # [U]
    wb: jax.Array  # [U, U]     (1x1 conv 2)
    anb_bias: jax.Array  # [U]
    anb_logs: jax.Array  # [U]
    wc: jax.Array  # [9, U, C]  (3x3 zeros-conv, gain folded, permuted)
    bias_c: jax.Array  # [C]     (gain folded, permuted)
    clamp_scale: jax.Array  # [C/2] (realnvp) or [0]
    clamp_shift: jax.Array  # [C/2] (realnvp) or [0]


def _clamp(log_scale, clamp_type: str, scale, shift):
    if clamp_type == "glow":
        return jnp.log(jax.nn.sigmoid(log_scale + 2.0))
    if clamp_type == "softclamp":
        return 2.5 * 0.636 * jnp.arctan(log_scale / 2.5)
    if clamp_type == "realnvp":
        return scale * jnp.tanh(log_scale) + shift
    return log_scale


def _coupling_net(z1, cond, p: GlowStepParams, clamp_type: str):
    """Shared by fwd/inv: (z1, cond) -> (shift, s). Plain jnp ops — used
    both in the jnp reference and INSIDE the kernel (on VMEM values)."""
    bt, h, w, c2 = z1.shape
    rows = bt * h * w
    ca = c2 + cond.shape[-1]
    u = p.wb.shape[0]
    hcat = jnp.concatenate([z1, cond], axis=-1)
    hp = jnp.pad(hcat, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((rows, u), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = hp[:, dy : dy + h, dx : dx + w, :].reshape(rows, ca)
            acc = acc + jnp.dot(sl, p.wa[dy * 3 + dx],
                                preferred_element_type=jnp.float32)
    ha = jax.nn.relu((acc + p.ana_bias) * jnp.exp(p.ana_logs))
    hb = jnp.dot(ha, p.wb, preferred_element_type=jnp.float32)
    hb = jax.nn.relu((hb + p.anb_bias) * jnp.exp(p.anb_logs))
    hbp = jnp.pad(hb.reshape(bt, h, w, u), ((0, 0), (1, 1), (1, 1), (0, 0)))
    # shape[-1]: the chain kernel (glowchain.py) streams vector params as
    # [1, C] blocks (Mosaic block-shape rule); both layouts broadcast the
    # same, only the channel-count read must be axis-agnostic
    c = p.an_bias.shape[-1]
    acc2 = jnp.zeros((rows, c), jnp.float32) + p.bias_c
    for dy in range(3):
        for dx in range(3):
            sl = hbp[:, dy : dy + h, dx : dx + w, :].reshape(rows, u)
            acc2 = acc2 + jnp.dot(sl, p.wc[dy * 3 + dx],
                                  preferred_element_type=jnp.float32)
    shift = acc2[:, : c // 2]
    s = _clamp(acc2[:, c // 2 :], clamp_type, p.clamp_scale, p.clamp_shift)
    return shift.reshape(bt, h, w, c // 2), s.reshape(bt, h, w, c // 2)


def _ld_sum(s):
    """Per-sample sum of s [bt,h,w,half] -> [bt,1], as staged axis
    reductions (a flat cross-lane reshape doesn't lower in Mosaic)."""
    return jnp.sum(jnp.sum(s, axis=(1, 2)), axis=-1, keepdims=True)


def glowstep_jnp(x, cond, p: GlowStepParams, *, clamp_type: str,
                 reverse: bool):
    """jnp reference of the fused step. Returns (y, dyn_logdet[B,1]) where
    dyn_logdet is the coupling's per-sample sum(s) (static actnorm/1x1
    terms are added by the caller)."""
    bt, h, w, c = x.shape
    rows = bt * h * w
    if not reverse:
        y = (x + p.an_bias) * jnp.exp(p.an_logs)
        y = jnp.dot(y.reshape(rows, c), p.w1x1,
                    preferred_element_type=jnp.float32).reshape(bt, h, w, c)
        z1, z2 = y[..., : c // 2], y[..., c // 2 :]
        shift, s = _coupling_net(z1, cond, p, clamp_type)
        z2 = (z2 + shift) * jnp.exp(s)
        out = jnp.concatenate([z1, z2], axis=-1)
        return out, _ld_sum(s)
    z1, z2o = x[..., : c // 2], x[..., c // 2 :]
    shift, s = _coupling_net(z1, cond, p, clamp_type)
    z2 = z2o * jnp.exp(-s) - shift
    y = jnp.concatenate([z1, z2], axis=-1)
    y = jnp.dot(y.reshape(rows, c), p.w1x1,
                preferred_element_type=jnp.float32).reshape(bt, h, w, c)
    out = y * jnp.exp(-p.an_logs) - p.an_bias
    return out, _ld_sum(s)


def _kernel(x_ref, cond_ref, *param_refs, out_ref, ld_ref, clamp_type,
            reverse):
    p = GlowStepParams(*(r[:] for r in param_refs))
    y, ld = glowstep_jnp(x_ref[:], cond_ref[:], p, clamp_type=clamp_type,
                         reverse=reverse)
    out_ref[:] = y
    # lane dim must be 128: broadcast the per-sample logdet across lanes
    ld_ref[:] = jnp.broadcast_to(ld, ld_ref.shape)


def _pick_batch_tile(b: int, h: int, w: int) -> int:
    """Rows per program ~2k keeps matmuls MXU-sized while the unrolled
    3x3's nine U-wide shifted slices (the VMEM hot spot: 9*rows*U*4B at
    U=256 is ~18MB/2k rows) fit the raised 64MB scoped-VMEM budget. Must
    be a multiple of 8 (sublane tile constraint on the ld output)."""
    target = max(8, (2048 // (h * w)) // 8 * 8)
    return min(-(-b // 8) * 8, target)


@functools.partial(jax.jit, static_argnames=("clamp_type", "reverse"))
def _glowstep_pallas(x, cond, p: GlowStepParams, clamp_type: str,
                     reverse: bool):
    b, h, w, c = x.shape
    bt = _pick_batch_tile(b, h, w)
    b_pad = -(-b // bt) * bt
    if b_pad != b:  # zero-pad batch to a tile multiple; sliced back below
        pad = ((0, b_pad - b), (0, 0), (0, 0), (0, 0))
        x = jnp.pad(x, pad)
        cond = jnp.pad(cond, pad)
    grid = (b_pad // bt,)

    def batch_spec(ch):
        return pl.BlockSpec((bt, h, w, ch), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    param_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in p]
    kern = functools.partial(_kernel, clamp_type=clamp_type, reverse=reverse)

    def wrapped(x_ref, cond_ref, *rest):
        *prefs, out_ref, ld_ref = rest
        kern(x_ref, cond_ref, *prefs, out_ref=out_ref, ld_ref=ld_ref)

    out, ld = pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=[batch_spec(c), batch_spec(cond.shape[-1])] + param_specs,
        out_specs=(
            batch_spec(c),
            pl.BlockSpec((bt, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 128), jnp.float32),
        ),
        # the unrolled 3x3s keep up to 9 shifted U-wide slices live; the
        # default 16MB scoped-VMEM cap is too tight at U=256 with wide
        # cond channels (v5e has 128MB VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ) if _HAS_PALLAS and hasattr(pltpu, "CompilerParams") else None,
        # CPU (tests / virtual meshes): interpreter mode
        interpret=(jax.default_backend() != "tpu"),
    )(x, cond, *p)
    return out[:b], ld[:b, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def glowstep_fused(x, cond, p: GlowStepParams, clamp_type: str,
                   reverse: bool):
    """Fused GlowStep: (y, dyn_logdet[B]). Pallas forward, jnp-remat VJP."""
    return _glowstep_pallas(x, cond, p, clamp_type, reverse)


def _fused_fwd(x, cond, p, clamp_type, reverse):
    out = _glowstep_pallas(x, cond, p, clamp_type, reverse)
    return out, (x, cond, p)


def _fused_bwd(clamp_type, reverse, res, g):
    x, cond, p = res

    def ref(x_, c_, p_):
        y, ld = glowstep_jnp(x_, c_, p_, clamp_type=clamp_type,
                             reverse=reverse)
        return y, ld[:, 0]

    _, vjp = jax.vjp(ref, x, cond, p)
    return vjp(g)


glowstep_fused.defvjp(_fused_fwd, _fused_bwd)
