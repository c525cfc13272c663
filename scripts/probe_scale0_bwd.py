"""Where does scale 0's backward go? (slope-timed decomposition)

The honest per-scale probe (probe_flow_scales.py --slope) pins the prod
flow's cost on scale 0 (32x32, C=4): fwd 1.2 ms vs fwd+grad 5.1 ms per
frame — the BACKWARD is 3.2x the forward at only ~31 TFLOP/s. This probe
narrows the 3.9 ms: grad-to-x vs grad-to-params, bf16 coupling matmuls,
and the coupling stack alone in two formulations (lax.conv vs 9-shifted
matmuls) whose backwards XLA lowers very differently (the conv dgrad of
the U->C=4 zeros-conv contracts over Cout=4 — 3% MXU lane utilization).

All timings use the in-program scan-repeat slope (dispatch floor
cancelled), same method as probe_flow_scales.py --slope.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from recurrent_flows_tpu.config import GlowConfig
from recurrent_flows_tpu.flows.glow import ListGlow
from recurrent_flows_tpu.utils.compilation_cache import enable as _enable_cache

B, HW, C, CC, U, K = 30, 32, 4, 16, 256, 10


def slope_time(make_fn, x, runs, r_lo=2, r_hi=8):
    times = {}
    for R in (r_lo, r_hi):
        f = jax.jit(make_fn(R))

        @jax.jit
        def g(chain, xx):
            return f(xx * (1.0 + 0.0 * chain))

        chain = g(jnp.float32(0.0), x)
        float(chain)
        t0 = time.perf_counter()
        for _ in range(runs):
            chain = g(chain, x)
        float(chain)
        times[R] = (time.perf_counter() - t0) / runs * 1000.0
    return (times[r_hi] - times[r_lo]) / (r_hi - r_lo), times


def scanner(step_fn):
    """Wrap a per-iteration scalar fn into an R-repeat scan with a data
    dependence between iterations."""

    def make(R):
        def f(x):
            def body(carry, _):
                x_r, acc = carry
                l = step_fn(x_r)
                return (x_r * (1.0 + 1e-8 * l), acc + l), None

            (_, acc), _ = jax.lax.scan(body, (x, 0.0), None, length=R)
            return acc

        return f

    return make


def emit(name, ms, times):
    print(json.dumps(dict(variant=name, ms_per_iter=round(ms, 3),
                          ms_lo=round(times[2], 2), ms_hi=round(times[8], 2))),
          flush=True)


def full_scale0(runs, overrides):
    cfg = GlowConfig(L=1, K=K, learn_prior=False, **overrides)
    m = ListGlow(in_channels=1, image_size=HW * 2, cfg=cfg)
    kx, kc, ki = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(kx, (B, HW * 2, HW * 2, 1))
    cond = jax.random.normal(kc, (B, HW, HW, CC))
    v = m.init(ki, x, [cond], None, jax.random.key(9))
    params, consts = v["params"], v.get("consts", {})

    def nll(p, xx):
        _, out = m.apply({"params": p, "consts": consts}, xx, [cond], None,
                         dequantize=False, method="log_prob")
        return jnp.mean(out)

    tag = "+".join(f"{k}={v}" for k, v in overrides.items()) or "f32"
    emit(f"scale0 fwd [{tag}]",
         *slope_time(scanner(lambda xr: nll(params, xr)), x, runs))
    emit(f"scale0 fwd+grad(params) [{tag}]",
         *slope_time(scanner(
             lambda xr: jax.value_and_grad(nll)(params, xr)[0]
             + sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(
                 jax.grad(nll)(params, xr)))), x, runs))
    emit(f"scale0 fwd+grad(x only) [{tag}]",
         *slope_time(scanner(
             lambda xr: jnp.sum(jax.grad(lambda xx: nll(params, xx))(xr))),
             x, runs))


def coupling_stack(runs, impl: str, wrt: str):
    """The scale-0 coupling net alone: conv3x3(18->U) + an/relu +
    1x1(U->U) + an/relu + conv3x3(U->4)."""
    ks = jax.random.split(jax.random.key(1), 6)
    z1 = jax.random.normal(ks[0], (B, HW, HW, C // 2))
    cond = jax.random.normal(ks[1], (B, HW, HW, CC))
    ca = C // 2 + CC
    wa = jax.random.normal(ks[2], (3, 3, ca, U)) * 0.05
    wb = jax.random.normal(ks[3], (1, 1, U, U)) * 0.05
    wc = jax.random.normal(ks[4], (3, 3, U, C)) * 0.05
    params = dict(wa=wa, wb=wb, wc=wc)
    dn = jax.lax.conv_dimension_numbers(z1.shape, wa.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    def net_conv(p, z):
        h = jnp.concatenate([z, cond], -1)
        h = jax.nn.relu(jax.lax.conv_general_dilated(
            h, p["wa"], (1, 1), "SAME", dimension_numbers=dn))
        h = jax.nn.relu(jax.lax.conv_general_dilated(
            h, p["wb"], (1, 1), "SAME", dimension_numbers=dn))
        out = jax.lax.conv_general_dilated(
            h, p["wc"], (1, 1), "SAME", dimension_numbers=dn)
        return jnp.sum(out * out)

    def net_shift(p, z):
        rows = B * HW * HW
        h = jnp.concatenate([z, cond], -1)
        hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((rows, U), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                sl = hp[:, dy:dy + HW, dx:dx + HW, :].reshape(rows, ca)
                acc += jnp.dot(sl, p["wa"][dy, dx],
                               preferred_element_type=jnp.float32)
        ha = jax.nn.relu(acc)
        hb = jax.nn.relu(jnp.dot(ha, p["wb"][0, 0],
                                 preferred_element_type=jnp.float32))
        hbp = jnp.pad(hb.reshape(B, HW, HW, U),
                      ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc2 = jnp.zeros((rows, C), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                sl = hbp[:, dy:dy + HW, dx:dx + HW, :].reshape(rows, U)
                acc2 += jnp.dot(sl, p["wc"][dy, dx],
                                preferred_element_type=jnp.float32)
        return jnp.sum(acc2 * acc2)

    net = net_conv if impl == "conv" else net_shift
    if wrt == "none":
        step = lambda z: net(params, z)
    elif wrt == "x":
        step = lambda z: jnp.sum(jax.grad(net, argnums=1)(params, z))
    else:  # params
        step = lambda z: sum(
            jnp.sum(t) for t in jax.tree_util.tree_leaves(
                jax.grad(net)(params, z))) + 0.0 * jnp.sum(z)
    emit(f"coupling[{impl}] grad={wrt}", *slope_time(scanner(step), z1, runs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=15)
    ap.add_argument("--mode", default="full",
                    choices=["full", "bf16", "glue", "coupling"])
    args = ap.parse_args()
    _enable_cache()
    if args.mode == "full":
        full_scale0(args.runs, {})
    elif args.mode == "bf16":
        full_scale0(args.runs, {"coupling_dtype": "bfloat16"})
    elif args.mode == "glue":
        # shrink the coupling net to ~nothing: what remains is the per-step
        # glue (actnorm+1x1 fold, split/concat, clamp, affine, logdet) —
        # dominated by dispatch/fusion boundaries on <=0.5 MB tensors
        full_scale0(args.runs, {"n_units_affine": 16})
    else:
        for impl in ("conv", "shift"):
            for wrt in ("none", "x", "params"):
                coupling_stack(args.runs, impl, wrt)


if __name__ == "__main__":
    main()
