"""Per-scale decomposition of the flow's train-step cost.

The round-3 roofline (docs/PERF.md) says the FLOW is ~103 of the prod
step's 111 ms, running at ~1/3 of the bandwidth the conv-net parts
sustain — but it never said WHICH of the L=5 scales (32x32 C=4 ...
2x2 C=64) holds the time. This probe times each scale's K-step GlowStep
chain standalone (fwd and fwd+grad, chained-dispatch value-fetch timing,
same method as scripts/profile_prodstep.py) at the production shapes:

  scale l: x [30, 32/2^l, 32/2^l, 4*2^l], cond channels 16*2^l

so kernel work can be aimed at the scale that actually costs, and the
"irreducible?" question (verdict r3 #1) gets per-scale evidence.

Each scale is built as ListGlow(L=1, K=10, learn_prior=False) — exactly
the K GlowSteps, no split/prior — and log_prob is called with
dequantize=False so the chain is the whole program.

Usage: python scripts/probe_flow_scales.py [--runs 20] [--scales 0,1,2]
                                           [--grad-only]
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

V5E_F32_PEAK_TFLOPS = 98.5
V5E_HBM_GBPS = 819.0
B = 30


def _chain_time(fn, args, runs):
    @jax.jit
    def g(chain, x, *rest):
        out = fn(x + 0.0 * chain, *rest)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(out))

    gflop = gbytes = None
    try:
        cost = g.lower(jnp.float32(0.0), *args).compile().cost_analysis()
        gflop = round(float(cost.get("flops", 0.0)) / 1e9, 2)
        gbytes = round(float(cost.get("bytes accessed", 0.0)) / 1e9, 3)
    except Exception:
        pass
    chain = g(jnp.float32(0.0), *args)
    float(chain)
    t0 = time.perf_counter()
    for _ in range(runs):
        chain = g(chain, *args)
    float(chain)
    ms = (time.perf_counter() - t0) / runs * 1000.0
    roof = None
    if gflop is not None and gbytes is not None:
        roof = max(gflop / V5E_F32_PEAK_TFLOPS, gbytes / (V5E_HBM_GBPS / 1000.0))
    return ms, gflop, gbytes, roof


def _build_scale(l: int, overrides: dict):
    hw = 32 // (2 ** l)
    c = 4 * (2 ** l)
    cc = 16 * (2 ** l)
    cfg = GlowConfig(L=1, K=10, learn_prior=False, **overrides)
    m = ListGlow(in_channels=c // 4, image_size=hw * 2, cfg=cfg)
    kx, kc, ki = jax.random.split(jax.random.key(l), 3)
    x = jax.random.normal(kx, (B, hw * 2, hw * 2, c // 4))
    cond = jax.random.normal(kc, (B, hw, hw, cc))
    v = m.init(ki, x, [cond], None, jax.random.key(9))

    def nll(p, xx):
        _, out = m.apply(
            {"params": p, "consts": v.get("consts", {})}, xx, [cond], None,
            dequantize=False, method="log_prob",
        )
        return jnp.mean(out)

    return nll, v["params"], x


def probe_scale_slope(l: int, runs: int, overrides: dict,
                      r_lo: int = 2, r_hi: int = 8):
    """Honest in-program per-iteration cost: scan the scale's chain R
    times inside ONE jit (iterations serialized by a data dependence),
    time at R=r_lo and R=r_hi, report the slope. This cancels the
    per-executable dispatch floor that poisons the standalone numbers
    (scale 4 standalone: 2.4 ms vs 0.28 ms roofline — the floor, not
    the chain)."""
    nll, params, x = _build_scale(l, overrides)

    def make(R, with_grad):
        def body(carry, _):
            x_r, acc = carry
            lm = nll(params, x_r)
            return (x_r * (1.0 + 1e-8 * lm), acc + lm), None

        def f(xx):
            (_, acc), _ = jax.lax.scan(body, (xx, 0.0), None, length=R)
            return acc

        if with_grad:
            def g(xx):
                def lp(p):
                    def body_p(carry, _):
                        x_r, acc = carry
                        lm = nll(p, x_r)
                        return (x_r * (1.0 + 1e-8 * lm), acc + lm), None
                    (_, acc), _ = jax.lax.scan(body_p, (xx, 0.0), None,
                                               length=R)
                    return acc
                val, grads = jax.value_and_grad(lp)(params)
                return val + sum(jnp.sum(t) for t in
                                 jax.tree_util.tree_leaves(grads))
            return g
        return f

    for variant, with_grad in (("fwd", False), ("fwd+grad", True)):
        times = {}
        for R in (r_lo, r_hi):
            ms, _, _, _ = _chain_time(make(R, with_grad), (x,), runs)
            times[R] = ms
        slope = (times[r_hi] - times[r_lo]) / (r_hi - r_lo)
        print(json.dumps(dict(
            scale=l, variant=f"{variant}/iter(slope)", ms=round(slope, 3),
            ms_lo=round(times[r_lo], 3), ms_hi=round(times[r_hi], 3),
            r_lo=r_lo, r_hi=r_hi,
        )), flush=True)


def probe_scale(l: int, runs: int, grad_only: bool, overrides: dict):
    hw = 32 // (2 ** l)
    c = 4 * (2 ** l)
    cc = 16 * (2 ** l)
    cfg = GlowConfig(L=1, K=10, learn_prior=False, **overrides)
    m = ListGlow(in_channels=c // 4, image_size=hw * 2, cfg=cfg)
    kx, kc, ki = jax.random.split(jax.random.key(l), 3)
    # ListGlow.f squeezes first: feed the pre-squeeze shape
    x = jax.random.normal(kx, (B, hw * 2, hw * 2, c // 4))
    cond = jax.random.normal(kc, (B, hw, hw, cc))
    v = m.init(ki, x, [cond], None, jax.random.key(9))
    params, consts = v["params"], v.get("consts", {})

    def nll(p, xx):
        _, out = m.apply(
            {"params": p, "consts": consts}, xx, [cond], None,
            dequantize=False, method="log_prob",
        )
        return jnp.mean(out)

    rows = []
    if not grad_only:
        ms, gf, gb, roof = _chain_time(
            lambda xx: nll(params, xx), (x,), runs)
        rows.append(dict(scale=l, variant="fwd", ms=round(ms, 3), gflop=gf,
                         gbytes=gb, roofline_ms=round(roof, 3) if roof else None))
    gfn = jax.value_and_grad(nll)
    ms, gf, gb, roof = _chain_time(
        lambda xx: gfn(params, xx), (x,), runs)
    rows.append(dict(scale=l, variant="fwd+grad", ms=round(ms, 3), gflop=gf,
                     gbytes=gb, roofline_ms=round(roof, 3) if roof else None))
    for r in rows:
        if r["gflop"] and r["ms"]:
            r["tflops"] = round(r["gflop"] / r["ms"], 2)
        if r["gbytes"] and r["ms"]:
            r["gbps"] = round(r["gbytes"] / r["ms"] * 1000, 0)
        print(json.dumps(r), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=20)
    ap.add_argument("--scales", default="0,1,2,3,4")
    ap.add_argument("--grad-only", action="store_true")
    ap.add_argument("--slope", action="store_true",
                    help="in-program scan-repeat slope timing (honest "
                         "per-iteration cost, dispatch floor cancelled)")
    ap.add_argument("--set", default="",
                    help="GlowConfig overrides, e.g. coupling_dtype=bfloat16")
    args = ap.parse_args()
    _enable_cache()
    overrides = {}
    for kv in args.set.split(","):
        if not kv:
            continue
        k, val = kv.split("=")
        if val in ("True", "False"):
            val = val == "True"
        overrides[k] = val
    for l in (int(s) for s in args.scales.split(",")):
        if args.slope:
            probe_scale_slope(l, args.runs, overrides)
        else:
            probe_scale(l, args.runs, args.grad_only, overrides)


if __name__ == "__main__":
    main()
