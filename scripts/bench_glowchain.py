#!/usr/bin/env python
"""Isolate the glowchain kernel: kernel-vs-XLA per scale, prep excluded.

The end-to-end rollout A/B (chain_impl='sample') regressed 27.1 -> 31.3 ms
(docs/PERF.md round 3e). Two suspects: (a) the Mosaic kernel itself is
slower than XLA's op stream, (b) the per-step param prep + [K,...] stack
is re-run per frame instead of being LICM-hoisted out of the sampling
scan. This bench times glowchain_fused against the identical jnp chain
with PRE-BUILT stacked params (prep outside the timed function), chained
value-fetch timing, so (a) is measured alone.

Run on the TPU: python scripts/bench_glowchain.py [--runs 50]
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

from recurrent_flows_tpu.ops.pallas.glowchain import (
    glowchain_fused,
    glowchain_jnp,
)
from recurrent_flows_tpu.ops.pallas.glowstep import GlowStepParams

# production flow scales with H*W <= 1024 (the chain gate), B=30
SCALES = [(32, 4, 16), (16, 8, 32), (8, 16, 64), (4, 32, 128), (2, 64, 256)]
B = int(os.environ.get("GC_B", "30"))
U = 256


def rand_params(key, c, cc, k_steps: int):
    ks = iter(jax.random.split(key, 16))
    half = c // 2
    ca = half + cc
    k = k_steps

    def n(shape, scale=0.05):
        return jax.random.normal(next(ks), shape, jnp.float32) * scale

    return GlowStepParams(
        an_bias=n((k, c)), an_logs=n((k, c)),
        w1x1=jnp.tile(jnp.eye(c)[None], (k, 1, 1)) + n((k, c, c)),
        wa=n((k, 9, ca, U)), ana_bias=n((k, U)), ana_logs=n((k, U)),
        wb=n((k, U, U)), anb_bias=n((k, U)), anb_logs=n((k, U)),
        wc=n((k, 9, U, c)), bias_c=n((k, c)),
        clamp_scale=jnp.ones((k, half)), clamp_shift=jnp.zeros((k, half)),
    )


def time_impl(h, c, cc, impl: str, runs: int, k_steps: int,
              reverse: bool = True):
    x = jax.random.normal(jax.random.key(0), (B, h, h, c))
    cond = jax.random.normal(jax.random.key(1), (B, h, h, cc))
    ps = rand_params(jax.random.key(2), c, cc, k_steps)

    if impl == "pallas":
        def run(x, cond, ps):
            y, ld = glowchain_fused(x, cond, ps, "realnvp", reverse)
            return y, ld
    else:
        def run(x, cond, ps):
            y, ld = glowchain_jnp(x, cond, ps, clamp_type="realnvp",
                                  reverse=reverse)
            return y, ld[:, 0]

    @jax.jit
    def fn(chain, x, cond, ps):
        y, ld = run(x + 0.0 * chain, cond, ps)
        return jnp.sum(y) + jnp.sum(ld)

    chain = fn(jnp.float32(0.0), x, cond, ps)
    float(chain)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(runs):
        chain = fn(chain, x, cond, ps)
    float(chain)
    return (time.perf_counter() - t0) / runs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=50)
    ap.add_argument("--impls", default="xla,pallas")
    ap.add_argument("--slope", action="store_true",
                    help="time K=10 and K=30 chains; report the per-step "
                         "device cost (K-slope cancels the ~1 ms "
                         "per-dispatch tunnel floor, docs/PERF.md)")
    args = ap.parse_args()
    depths = (10, 30) if args.slope else (10,)
    for impl in args.impls.split(","):
        per = {}
        for h, c, cc in SCALES:
            ts = [time_impl(h, c, cc, impl, args.runs, k) for k in depths]
            name = f"{h}x{h}xc{c}"
            if args.slope:
                per[name] = {
                    "k10_ms": round(ts[0] * 1000, 3),
                    "k30_ms": round(ts[1] * 1000, 3),
                    "us_per_step": round((ts[1] - ts[0]) / 20 * 1e6, 1),
                }
            else:
                per[name] = round(ts[0] * 1000, 3)
        if not args.slope:
            per["total_ms"] = round(sum(per.values()), 3)
        print(json.dumps({impl: per, "b": B, "reverse": True}), flush=True)


if __name__ == "__main__":
    main()
