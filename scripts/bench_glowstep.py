#!/usr/bin/env python
"""Microbenchmark: K GlowSteps fwd(+bwd) per production-config flow scale.

The production RFN (L=5, 64px) runs its K=10 GlowStep chains at spatial
scales 32,16,8,4,2 with channels 4,8,16,32,64 — the deep scales leave the
MXU underutilized under XLA's conv path (PERF.md "known headroom"). This
script times each scale for the available coupling implementations so
kernel experiments iterate in seconds instead of the ~6 min production
recompile.

Run on the TPU: python scripts/bench_glowstep.py [--impl xla,im2col,...]
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
from recurrent_flows_tpu.flows.glow import GlowStep

# (H, C, cond_C) per scale of the 64px production config; B*T rows flow
# through each scale per loss eval (B=30, T-1=9 -> 270)
SCALES = [
    (32, 4, 16),
    (16, 8, 32),
    (8, 16, 64),
    (4, 32, 128),
    (2, 64, 256),
]
BT = int(__import__("os").environ.get("GS_BT", "270"))
K = 10


def time_stack(h, c, cc, *, impl: str, n_runs: int = 30, with_grad: bool = True,
               coupling_norm: str = "actnorm", reverse: bool = False):
    cfg = GlowConfig(L=1, K=K, n_units_affine=256, coupling_impl=impl,
                     coupling_norm=coupling_norm)
    steps = [GlowStep(c, cfg, spatial_shape=(h, h, c)) for _ in range(K)]
    x = jax.random.normal(jax.random.key(0), (BT, h, h, c))
    cond = jax.random.normal(jax.random.key(1), (BT, h, h, cc))
    variables = []
    for i, step in enumerate(steps):
        variables.append(step.init(jax.random.key(2 + i), x, cond))

    def stack(params_list, x):
        if reverse:  # the sampling g-pass regime: no logdet, steps K-1..0
            for step, v, p in zip(reversed(steps), reversed(variables),
                                  reversed(params_list)):
                x, _ = step.apply(
                    {"params": p, "consts": v.get("consts", {})}, x, cond,
                    None, reverse=True,
                )
            return x, jnp.zeros((x.shape[0],))
        logdet = jnp.zeros((x.shape[0],))
        for step, v, p in zip(steps, variables, params_list):
            x, logdet = step.apply(
                {"params": p, "consts": v.get("consts", {})}, x, cond, logdet
            )
        return x, logdet

    if with_grad:
        def loss(params_list, x):
            z, logdet = stack(params_list, x)
            return jnp.sum(z ** 2) - jnp.sum(logdet)

        raw = jax.grad(loss)
    else:
        raw = stack

    # VALIDATED timing (docs/PERF.md round-3 correction): chain each
    # dispatch on the previous result inside the jit and fetch the final
    # scalar by value — block_until_ready is a no-op on this backend.
    @jax.jit
    def fn(chain, params_list, x):
        out = raw(params_list, x + 0.0 * chain)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(out))

    params_list = [v["params"] for v in variables]
    chain = fn(jnp.float32(0.0), params_list, x)
    float(chain)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(n_runs):
        chain = fn(chain, params_list, x)
    float(chain)
    return (time.perf_counter() - t0) / n_runs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", default="conv")
    ap.add_argument("--runs", type=int, default=30)
    ap.add_argument("--fwd_only", action="store_true")
    ap.add_argument("--reverse", action="store_true",
                    help="time the sampling g-pass regime (reverse steps, "
                         "no logdet, no grad)")
    ap.add_argument("--coupling_norm", default="actnorm")
    args = ap.parse_args()
    results = {}
    for impl in args.impls.split(","):
        per_scale = {}
        for h, c, cc in SCALES:
            if impl in ("im2col", "fused") and h * h > 256:
                continue  # im2col is a small-spatial lever only ('auto' gate)
            dt = time_stack(h, c, cc, impl=impl, n_runs=args.runs,
                            with_grad=not args.fwd_only and not args.reverse,
                            coupling_norm=args.coupling_norm,
                            reverse=args.reverse)
            per_scale[f"{h}x{h}xc{c}"] = round(dt * 1000, 3)
        per_scale["total_ms"] = round(sum(per_scale.values()), 3)
        results[impl] = per_scale
        print(json.dumps({impl: per_scale, "reverse": args.reverse,
                          "bt": BT}), flush=True)
    return results


if __name__ == "__main__":
    main()
