#!/usr/bin/env python
"""Rollout/sampling-path forensics (VERDICT r4 next #4): give the g-pass
the same treatment the round-4 campaign gave the train step.

Three probes, prod flow shapes (64x64 -> L=5 scales, K=10, B=30):

  --mode slopes : per-scale REVERSE (g) per-iteration device cost via the
                  slope method (R iterations chained inside one jit at
                  R_lo/R_hi; slope cancels the dispatch floor) — the
                  reverse analogue of probe_flow_scales.py.
  --mode hlo    : kernel-launch attribution of the compiled FULL ListGlow
                  g-pass (all 5 scales + Split2d temperature draws):
                  launches, tiny(<1MB)/big split, op histogram, rng and
                  concat counts — the sampling "glue inventory".
  --mode serving: B=1 g-pass slope + launch count (the serving-latency
                  anatomy; round-4 drift 0.74->0.84 ms/frame was recorded
                  without any decomposition).

Reference sampling hot path: Flow/glow.py:90-102,143-160.
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from recurrent_flows_tpu.config import GlowConfig
from recurrent_flows_tpu.flows.glow import ListGlow
from recurrent_flows_tpu.utils.compilation_cache import enable as _enable_cache

B = 30
K = 10
L_FULL = 5


def _chain_time(fn, args, runs):
    """Chained-dispatch value-fetch timing (validated methodology,
    scripts/probe_rollout_timing.py)."""
    @jax.jit
    def g(chain, *a):
        out = fn(*a, chain)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(out))

    chain = g(jnp.float32(0.0), *args)
    float(chain)
    t0 = time.perf_counter()
    for _ in range(runs):
        chain = g(chain, *args)
    float(chain)
    return (time.perf_counter() - t0) / runs * 1000.0


def _build_scale_g(l: int, batch: int):
    """One prod scale's K-step chain in the REVERSE direction: returns
    (g_fn(z, chain) -> x, z0). Shapes as in probe_flow_scales: scale l
    has post-squeeze [B, 32/2^l, 32/2^l, 4*2^l], cond 16*2^l channels."""
    hw = 32 // (2 ** l)
    c = 4 * (2 ** l)
    cc = 16 * (2 ** l)
    cfg = GlowConfig(L=1, K=K, learn_prior=False)
    m = ListGlow(in_channels=c // 4, image_size=hw * 2, cfg=cfg)
    kx, kc, ki = jax.random.split(jax.random.key(l), 3)
    x = jax.random.normal(kx, (batch, hw * 2, hw * 2, c // 4))
    cond = jax.random.normal(kc, (batch, hw, hw, cc))
    v = m.init(ki, x, [cond], None, jax.random.key(9))
    var = {"params": v["params"], "consts": v.get("consts", {})}
    z0 = jax.random.normal(jax.random.key(7), (batch, hw, hw, c))

    def g_fn(z, chain):
        return m.apply(var, z * (1.0 + 1e-8 * chain), [cond],
                       jax.random.key(11), method="g")

    return g_fn, z0


def probe_scale_g_slope(l: int, runs: int, batch: int,
                        r_lo: int = 2, r_hi: int = 8):
    g_fn, z0 = _build_scale_g(l, batch)

    def make(R):
        def f(z, chain):
            def body(carry, _):
                z_r, acc = carry
                x = g_fn(z_r, acc)
                lm = jnp.mean(x)
                return (z_r * (1.0 + 1e-8 * lm), acc + lm), None

            (_, acc), _ = jax.lax.scan(body, (z, chain), None, length=R)
            return acc

        return f

    times = {}
    for R in (r_lo, r_hi):
        times[R] = _chain_time(make(R), (z0,), runs)
    slope = (times[r_hi] - times[r_lo]) / (r_hi - r_lo)
    print(json.dumps(dict(
        scale=l, batch=batch, variant="g/iter(slope)", ms=round(slope, 3),
        ms_lo=round(times[r_lo], 3), ms_hi=round(times[r_hi], 3),
        r_lo=r_lo, r_hi=r_hi)), flush=True)
    return slope


def _build_full_g(batch: int, **overrides):
    """The full prod flow g-pass: L=5 scales with conditional Split2d
    redraws, realnvp clamps, learned prior OFF (the base draw is the
    caller's; RFN draws it from the prior net — tiny vs the chain)."""
    cfg = GlowConfig(L=L_FULL, K=K, n_units_affine=256, n_units_prior=512,
                     flow_norm="actnorm", clamp_type="realnvp",
                     learn_prior=False, **overrides)
    m = ListGlow(in_channels=1, image_size=64, cfg=cfg)
    kx, ki = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (batch, 64, 64, 1))
    conds = [
        jax.random.normal(jax.random.key(10 + l),
                          (batch, 32 // 2 ** l, 32 // 2 ** l, 16 * 2 ** l))
        for l in range(L_FULL)
    ]
    v = m.init(ki, x, conds, None, jax.random.key(9))
    var = {"params": v["params"], "consts": v.get("consts", {})}
    hw = 64 // 2 ** L_FULL
    c_final = m.apply(var, x, conds, jnp.zeros(batch),
                      method="f")[0].shape[-1]
    z0 = jax.random.normal(jax.random.key(7), (batch, hw, hw, c_final))

    def g_fn(z, key, chain):
        return m.apply(var, z * (1.0 + 1e-8 * chain), conds, key,
                       temperature=0.7, method="g")

    return g_fn, z0


def _attribute_launches(compiled, label: str):
    txt = compiled.as_text()
    entry = re.search(r"ENTRY[^{]*\{(.*?)\n\}", txt, re.S)
    body = entry.group(1) if entry else txt
    counts = collections.Counter()
    tiny = big = rng = concat = 0
    for ln in body.splitlines():
        ln = ln.strip()
        mo = re.match(r"%?[\w.\-]+ = (\S+?)(\{|\(| )", ln)
        if not mo:
            continue
        shape_tok = mo.group(1)
        op = re.search(r"= \S+ ([\w\-]+)\(", ln)
        opname = op.group(1) if op else "?"
        if opname in ("parameter", "constant", "tuple", "get"):
            continue
        if "rng" in ln or "Rng" in ln:
            rng += 1
        if opname == "concatenate" or "concatenate(" in ln:
            concat += 1
        dims = re.match(r"(\w+)\[([\d,]*)\]", shape_tok)
        if dims:
            dt, dd = dims.groups()
            n = 1
            for d in (dd.split(",") if dd else []):
                n *= int(d)
            bs = {"f32": 4, "bf16": 2, "s32": 4, "pred": 1, "u32": 4,
                  "f16": 2, "s8": 1, "u8": 1}.get(dt, 4)
            if n * bs < 1 << 20:
                tiny += 1
            else:
                big += 1
        counts[opname] += 1
    total = sum(counts.values())
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    out = dict(label=label, launches=total, tiny_lt_1mb=tiny, big=big,
               rng_tagged=rng, concats=concat,
               per_glowstep=round(total / (L_FULL * K), 1),
               gflop=round(cost.get("flops", 0.0) / 1e9, 1),
               gbytes=round(cost.get("bytes accessed", 0.0) / 1e9, 2),
               top_ops=dict(counts.most_common(10)))
    print(json.dumps(out), flush=True)
    return out


def probe_full_g(runs: int, batch: int, attribute: bool):
    g_fn, z0 = _build_full_g(batch)

    def make(R):
        def f(z, chain):
            def body(carry, i):
                z_r, acc = carry
                x = g_fn(z_r, jax.random.fold_in(jax.random.key(3), i),
                         acc)
                lm = jnp.mean(x)
                return (z_r * (1.0 + 1e-8 * lm), acc + lm), None

            (_, acc), _ = jax.lax.scan(body, (z, chain),
                                       jnp.arange(R))
            return acc

        return f

    if attribute:
        one = jax.jit(lambda z: g_fn(z, jax.random.key(3),
                                     jnp.float32(0.0)))
        _attribute_launches(one.lower(z0).compile(),
                            f"full-g-pass B={batch}")
    times = {}
    for R in (2, 8):
        times[R] = _chain_time(make(R), (z0,), runs)
    slope = (times[8] - times[2]) / 6.0
    print(json.dumps(dict(
        batch=batch, variant="full-g/iter(slope)", ms=round(slope, 3),
        ms_lo=round(times[2], 3), ms_hi=round(times[8], 3))), flush=True)


def probe_dtype_ab(blocks: int, runs: int, batch: int):
    """In-session interleaved A/B: f32 (default) vs coupling_dtype=bf16
    on the PROD-SHAPE full g-pass. The round-3 'bf16 = parity' verdict
    was measured on the SMALL bench rollout (op-count-bound, B=8/L=3);
    at prod shape (B=30/L=5) the g-pass is compute/traffic-bound, so the
    question is live again. Same methodology as bench_prodstep --ab:
    alternating blocks in one process, median of block slopes."""
    variants = {}
    for name, ov in (("f32", {}), ("bf16", dict(coupling_dtype="bfloat16"))):
        g_fn, z0 = _build_full_g(batch, **ov)

        def make(R, g_fn=g_fn):
            def f(z, chain):
                def body(carry, i):
                    z_r, acc = carry
                    x = g_fn(z_r, jax.random.fold_in(jax.random.key(3), i),
                             acc)
                    lm = jnp.mean(x)
                    return (z_r * (1.0 + 1e-8 * lm), acc + lm), None

                (_, acc), _ = jax.lax.scan(body, (z, chain), jnp.arange(R))
                return acc

            return f

        variants[name] = (make, z0)

    slopes = {"f32": [], "bf16": []}
    for blk in range(blocks):
        for name, (make, z0) in variants.items():
            times = {}
            for R in (2, 8):
                times[R] = _chain_time(make(R), (z0,), runs)
            s = (times[8] - times[2]) / 6.0
            slopes[name].append(round(s, 3))
            print(json.dumps(dict(block=blk, variant=name, ms=round(s, 3))),
                  flush=True)
    med = {k: sorted(v)[len(v) // 2] for k, v in slopes.items()}
    print(json.dumps(dict(
        ab="full-g coupling_dtype", batch=batch, blocks=slopes,
        median_f32_ms=med["f32"], median_bf16_ms=med["bf16"],
        bf16_speedup_pct=round(100 * (med["f32"] - med["bf16"]) / med["f32"],
                               1))), flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", default="slopes",
                    choices=["slopes", "hlo", "serving", "dtype_ab"])
    ap.add_argument("--runs", type=int, default=9)
    ap.add_argument("--blocks", type=int, default=4)
    ap.add_argument("--scales", default="0,1,2,3,4")
    args = ap.parse_args()
    _enable_cache()
    if args.mode == "slopes":
        total = 0.0
        for l in (int(s) for s in args.scales.split(",")):
            total += probe_scale_g_slope(l, args.runs, B)
        print(json.dumps(dict(sum_scale_slopes_ms=round(total, 3))),
              flush=True)
    elif args.mode == "hlo":
        probe_full_g(args.runs, B, attribute=True)
    elif args.mode == "dtype_ab":
        probe_dtype_ab(args.blocks, args.runs, B)
    else:
        probe_full_g(args.runs, 1, attribute=True)


if __name__ == "__main__":
    main()
