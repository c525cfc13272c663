"""Pallas TPU kernels for the flow hot path + jnp fallbacks.

Three fusions that keep intermediate tensors in VMEM instead of
round-tripping HBM between XLA fusion boundaries:

  * ``coupling_transform`` — the affine-coupling tail: z2' = (z2 + shift)
    * exp(s) together with the per-sample logdet reduction sum(s)
    (reference math: Flow/glow_modules.py:279-288);
  * ``actnorm_invconv`` — actnorm fold + invertible 1x1 conv as one
    row-tiled matmul: y = ((x + b) * exp(logs)) @ W^T (glow_modules.py
    :40-45 + :209-216);
  * ``convlstm_gates`` — the peephole ConvLSTM gate nonlinearity + state
    update given the fused gate conv output (Utils/modules.py:370-377).

Each op has a custom VJP whose backward is plain jnp (XLA fuses the
backward fine; the forward is the per-step hot loop). Dispatch: Pallas on
TPU, jnp elsewhere (toggle with RFT_PALLAS=0/1).
"""

from __future__ import annotations

import functools
import os
from math import prod as np_prod

import jax
import jax.numpy as jnp

try:  # pallas import can fail on exotic builds; everything falls back
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def pallas_enabled() -> bool:
    """Opt-in (RFT_PALLAS=1). The original async-dispatch comparison
    (151.6k vs 135.0k f/s) was produced with a method round 3 proved
    measures enqueue rate, not compute (docs/PERF.md round-3 correction),
    so treat it as directional only: pallas_call boundaries do block XLA
    from fusing these small memory-bound ops into the adjacent convs. The
    kernels remain available for larger-shape regimes and as the basis
    for the fully fused GlowStep (ops/pallas/glowstep.py)."""
    env = os.environ.get("RFT_PALLAS")
    if env is not None:
        return env not in ("0", "false", "")
    return False


# ---------------------------------------------------------------------------
# coupling transform
# ---------------------------------------------------------------------------


def _coupling_fwd_jnp(z2, shift, s, reverse):
    if not reverse:
        out = (z2 + shift) * jnp.exp(s)
    else:
        out = z2 * jnp.exp(-s) - shift
    logdet = jnp.sum(s.reshape(s.shape[0], -1), axis=-1)
    return out, logdet


def _coupling_kernel(z2_ref, shift_ref, s_ref, out_ref, ld_ref, *, reverse):
    s = s_ref[:]
    if not reverse:
        out_ref[:] = (z2_ref[:] + shift_ref[:]) * jnp.exp(s)
    else:
        out_ref[:] = z2_ref[:] * jnp.exp(-s) - shift_ref[:]
    ld_ref[pl.program_id(0), 0] = jnp.sum(s)


def _coupling_pallas(z2, shift, s, reverse):
    b = z2.shape[0]
    n = int(np_prod(z2.shape[1:]))
    lane = 128
    r = -(-n // lane)
    pad = r * lane - n

    def prep(a):
        a = a.reshape(b, n)
        if pad:
            a = jnp.pad(a, ((0, 0), (0, pad)))
        return a.reshape(b, r, lane)

    z2f, shf, sf = prep(z2), prep(shift), prep(s)
    out, ld = pl.pallas_call(
        functools.partial(_coupling_kernel, reverse=reverse),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, r, lane), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, lane), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, lane), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, r, lane), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole [B,1] scalar array
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, r, lane), z2.dtype),
            jax.ShapeDtypeStruct((b, 1), z2.dtype),
        ],
    )(z2f, shf, sf)
    out = out.reshape(b, r * lane)[:, :n].reshape(z2.shape)
    return out, ld[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _coupling_custom(z2, shift, s, reverse=False):
    return _coupling_pallas(z2, shift, s, reverse)


def _coupling_vjp_fwd(z2, shift, s, reverse):
    out = _coupling_custom(z2, shift, s, reverse)
    return out, (z2, shift, s)


def _coupling_vjp_bwd(reverse, res, g):
    z2, shift, s = res
    g_out, g_ld = g
    es = jnp.exp(s)
    gl = g_ld.reshape((-1,) + (1,) * (s.ndim - 1))
    if not reverse:
        dz2 = g_out * es
        dshift = g_out * es
        ds = g_out * (z2 + shift) * es + gl
    else:
        dz2 = g_out * jnp.exp(-s)
        dshift = -g_out
        ds = -g_out * z2 * jnp.exp(-s) + gl
    return dz2, dshift, ds


_coupling_custom.defvjp(_coupling_vjp_fwd, _coupling_vjp_bwd)


def coupling_transform(z2, shift, s, reverse=False):
    """(z2', logdet[B]) for the affine coupling tail.

    Pallas (custom VJP) on opt-in; otherwise plain jnp — fully
    differentiable in both fwd and rev mode.
    """
    if pallas_enabled():
        return _coupling_custom(z2, shift, s, reverse)
    return _coupling_fwd_jnp(z2, shift, s, reverse)


# ---------------------------------------------------------------------------
# actnorm + invconv
# ---------------------------------------------------------------------------


def _actnorm_invconv_jnp(x, bias, logs, w):
    y = (x + bias) * jnp.exp(logs)
    return jnp.einsum("...c,dc->...d", y, w)


def _ainv_kernel(x_ref, scale_ref, sbias_ref, wt_ref, out_ref):
    # out = (x * scale + sbias) @ w^T ; scale/sbias are the folded actnorm
    x = x_ref[:] * scale_ref[:] + sbias_ref[:]
    out_ref[:] = jnp.dot(x, wt_ref[:], preferred_element_type=jnp.float32)


def _actnorm_invconv_pallas(x, bias, logs, w):
    shape = x.shape
    c = shape[-1]
    rows = x.reshape(-1, c)
    n = rows.shape[0]
    tile = 256
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        rows = jnp.pad(rows, ((0, n_pad - n), (0, 0)))
    scale = jnp.exp(logs)
    sbias = (bias * scale)[None, :]
    out = pl.pallas_call(
        _ainv_kernel,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), x.dtype),
    )(rows, scale[None, :], sbias, w.T)
    return out[:n].reshape(shape)


@jax.custom_vjp
def _ainv_custom(x, bias, logs, w):
    return _actnorm_invconv_pallas(x, bias, logs, w)


def _ainv_vjp_fwd(x, bias, logs, w):
    return _ainv_custom(x, bias, logs, w), (x, bias, logs, w)


def _ainv_vjp_bwd(res, g):
    x, bias, logs, w = res
    scale = jnp.exp(logs)
    y = (x + bias) * scale  # pre-matmul activations
    gy = jnp.einsum("...d,dc->...c", g, w)
    dx = gy * scale
    red = tuple(range(gy.ndim - 1))
    dbias = jnp.sum(gy * scale, axis=red)
    dlogs = jnp.sum(gy * y, axis=red)
    dw = jnp.einsum("...d,...c->dc", g, y)
    return dx, dbias, dlogs, dw


_ainv_custom.defvjp(_ainv_vjp_fwd, _ainv_vjp_bwd)


def actnorm_invconv(x, bias, logs, w):
    """y = ((x + bias) * exp(logs)) @ w^T, fused (no logdet — computed by
    the caller from logs/w alone)."""
    if pallas_enabled():
        return _ainv_custom(x, bias, logs, w)
    return _actnorm_invconv_jnp(x, bias, logs, w)


# ---------------------------------------------------------------------------
# ConvLSTM gates
# ---------------------------------------------------------------------------


def _gates_jnp(gates, c, w_ci, w_cf, w_co):
    cc_i, cc_f, cc_o, cc_g = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(cc_i + w_ci * c)
    f = jax.nn.sigmoid(cc_f + w_cf * c)
    g = jnp.tanh(cc_g)
    c_next = f * c + i * g
    o = jax.nn.sigmoid(cc_o + w_co * c_next)
    h_next = o * jnp.tanh(c_next)
    return h_next, c_next


def _gates_kernel(g_ref, c_ref, wci_ref, wcf_ref, wco_ref, h_ref, cn_ref, *, hc):
    gates = g_ref[:]
    c = c_ref[:]
    cc_i = gates[..., :hc]
    cc_f = gates[..., hc : 2 * hc]
    cc_o = gates[..., 2 * hc : 3 * hc]
    cc_g = gates[..., 3 * hc :]
    i = jax.nn.sigmoid(cc_i + wci_ref[:] * c)
    f = jax.nn.sigmoid(cc_f + wcf_ref[:] * c)
    g = jnp.tanh(cc_g)
    c_next = f * c + i * g
    o = jax.nn.sigmoid(cc_o + wco_ref[:] * c_next)
    h_ref[:] = o * jnp.tanh(c_next)
    cn_ref[:] = c_next


def _gates_pallas(gates, c, w_ci, w_cf, w_co):
    b, h, w, hc4 = gates.shape
    hc = hc4 // 4
    peep = lambda p: jnp.broadcast_to(p, (1, h, w, hc)).reshape(h * w, hc)
    gf = gates.reshape(b, h * w, hc4)
    cf = c.reshape(b, h * w, hc)
    hn, cn = pl.pallas_call(
        functools.partial(_gates_kernel, hc=hc),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h * w, hc4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h * w, hc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h * w, hc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h * w, hc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h * w, hc), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h * w, hc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h * w, hc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h * w, hc), gates.dtype),
            jax.ShapeDtypeStruct((b, h * w, hc), gates.dtype),
        ],
    )(gf, cf, peep(w_ci), peep(w_cf), peep(w_co))
    return hn.reshape(b, h, w, hc), cn.reshape(b, h, w, hc)


@jax.custom_vjp
def _gates_custom(gates, c, w_ci, w_cf, w_co):
    return _gates_pallas(gates, c, w_ci, w_cf, w_co)


def _gates_vjp_fwd(gates, c, w_ci, w_cf, w_co):
    out = _gates_custom(gates, c, w_ci, w_cf, w_co)
    return out, (gates, c, w_ci, w_cf, w_co)


def _gates_vjp_bwd(res, g):
    # plain-jnp backward through the reference math
    gates, c, w_ci, w_cf, w_co = res
    _, vjp = jax.vjp(_gates_jnp, gates, c, w_ci, w_cf, w_co)
    return vjp(g)


_gates_custom.defvjp(_gates_vjp_fwd, _gates_vjp_bwd)


def convlstm_gates(gates, c, w_ci, w_cf, w_co):
    """Peephole gate nonlinearity + state update -> (h_next, c_next)."""
    if pallas_enabled():
        return _gates_custom(gates, c, w_ci, w_cf, w_co)
    return _gates_jnp(gates, c, w_ci, w_cf, w_co)
