"""Production-config (thesis L=5, 36M-param RFN) train-step timing.

Times the jitted loss+grad step (B=30, T=10 — the exact thesis workload,
configs.rfn_mnist_production) per coupling_impl, so flow-kernel changes
can be validated against the end-to-end number that matters
(docs/PERF.md "Production thesis config").

Usage: python scripts/bench_prodstep.py [--impls conv,auto] [--runs 20]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from recurrent_flows_tpu.configs import rfn_mnist_production
from recurrent_flows_tpu.models import RFN
from recurrent_flows_tpu.utils.compilation_cache import enable as _enable_cache


_SENTINEL = "default"


def make_step_timer(impl: str, batch_flow: bool = False,
                    batch: int | None = None,
                    coupling_dtype: str | None = None,
                    fold_weights: bool = True,
                    packed_layout: object = False,
                    scan_unroll: int = 1, chain_impl: str = "off",
                    dual_stream: bool = False,
                    remat_policy: object = _SENTINEL):
    """Build + compile the prod loss+grad step; return run_block(n) ->
    per-step seconds over one chained block of n dispatches. Lets A/B
    callers interleave measurement blocks of two variants in ONE process
    (the round-4 verdict: cross-session link variance ~4% swallowed the
    remat-policy delta, so pairs must be timed in-session)."""
    cfg, tcfg = rfn_mnist_production()
    cfg = dataclasses.replace(
        cfg, glow=dataclasses.replace(cfg.glow, coupling_impl=impl,
                                      chain_impl=chain_impl,
                                      coupling_dtype=coupling_dtype,
                                      fold_weights=fold_weights,
                                      packed_layout=packed_layout,
                                      dual_stream=dual_stream)
    )
    extra = {} if remat_policy is _SENTINEL else {"remat_policy": remat_policy}
    model = RFN(cfg, batch_flow=batch_flow, scan_unroll=scan_unroll, **extra)
    b, t = batch or tcfg.batch_size, tcfg.n_frames
    x = jax.random.uniform(
        jax.random.key(0), (b, t, cfg.image_size, cfg.image_size, 1)
    ) - 0.5
    variables = model.init(jax.random.key(1), x[:2], jax.random.key(2))

    @jax.jit
    def step(params, x, key, chain):
        # `chain` (a device scalar, usually the previous call's loss) is
        # folded into x INSIDE the jit: it forces on-device serialization
        # of back-to-back dispatches without any host/eager traffic —
        # eager chaining was measured to cost ~1 s/iter through the axon
        # tunnel (the 5 MB intermediate round-trips per eager op).
        x = x + 0.0 * chain

        def loss_fn(p):
            out = model.apply(
                {"params": p, "consts": variables.get("consts", {})},
                x, key, method="loss",
            )
            return out["nll"] + out["kl_free_bits"]

        return jax.value_and_grad(loss_fn)(params)

    params = variables["params"]
    # ONE compile per variant: lower+compile explicitly and dispatch
    # through the AOT executable (a jitted step() call would trigger a
    # SECOND full compile — the jit cache is not populated by lower(); at
    # prod scale over a cold persistent cache that doubling blew the
    # round-5 A/B past its 15-min budget).
    compiled = step.lower(params, x, jax.random.key(3),
                          jnp.float32(0.0)).compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        time_step.flops = float(cost.get("flops", 0.0))
        time_step.bytes = float(cost.get("bytes accessed", 0.0))
    except Exception:
        time_step.flops = 0.0
        time_step.bytes = 0.0
    # VALIDATED timing (round 3): block_until_ready is a no-op on this
    # axon backend (scripts/probe_rollout_timing.py), so each dispatch is
    # CHAINED on the previous loss (inside the jit) to force on-device
    # serialization, and the final loss is fetched BY VALUE.
    # Wall = runs*step + one link round-trip (~40 ms), amortized O(1/runs).
    loss, _ = compiled(params, x, jax.random.key(3), jnp.float32(0.0))
    float(loss)  # sync

    def run_block(n: int) -> float:
        """Per-step seconds over one chained block of n dispatches."""
        loss = compiled(params, x, jax.random.key(3), jnp.float32(0.0))[0]
        float(loss)  # sync the block start
        t0 = time.perf_counter()
        for i in range(n):
            loss, _ = compiled(params, x, jax.random.key(4 + i), loss)
        float(loss)
        return (time.perf_counter() - t0) / n

    return run_block


def time_step(impl: str, runs: int, **kw) -> float:
    return make_step_timer(impl, **kw)(runs)


def ab_step(impl: str, runs: int, base_kw: dict, var_kw: dict,
            blocks: int = 4, **common) -> dict:
    """Interleaved in-session A/B of two train-step variants.

    Both steps are compiled first, then ``blocks`` alternating A/B
    measurement blocks of runs//blocks dispatches each; reports the
    per-variant median-of-blocks and the delta. Interleaving cancels the
    slow link-speed drift that invalidated round 4's cross-session A/B."""
    n = max(1, runs // blocks)
    run_a = make_step_timer(impl, **common, **base_kw)
    run_b = make_step_timer(impl, **common, **var_kw)
    a_ms, b_ms = [], []
    run_a(2), run_b(2)  # settle both after compile
    for _ in range(blocks):
        a_ms.append(run_a(n) * 1000)
        b_ms.append(run_b(n) * 1000)
    med = lambda v: sorted(v)[len(v) // 2]
    return {
        "a_ms": round(med(a_ms), 2), "b_ms": round(med(b_ms), 2),
        "a_blocks": [round(v, 2) for v in a_ms],
        "b_blocks": [round(v, 2) for v in b_ms],
        "delta_pct": round(100 * (med(a_ms) - med(b_ms)) / med(a_ms), 2),
    }


def time_sample(impl: str, runs: int, fold_weights: bool = True,
                packed_layout: object = False,
                scan_unroll: int = 1, chain_impl: str = "off",
                batch: int | None = None) -> float:
    """Production-config predict rollout (warmup 5, predict 10) — the
    sampling path where coupling_impl='auto' engages the fused kernel on
    the deep scales (reverse direction, no grad/remat)."""
    cfg, tcfg = rfn_mnist_production()
    cfg = dataclasses.replace(
        cfg, glow=dataclasses.replace(cfg.glow, coupling_impl=impl,
                                      fold_weights=fold_weights,
                                      packed_layout=packed_layout,
                                      chain_impl=chain_impl)
    )
    model = RFN(cfg, scan_unroll=scan_unroll)
    b = batch or tcfg.batch_size
    x = jax.random.uniform(
        jax.random.key(0), (b, 5, cfg.image_size, cfg.image_size, 1)
    ) - 0.5
    variables = model.init(jax.random.key(1), x[:2, :2], jax.random.key(2))

    @jax.jit
    def rollout(v, x, key, chain):
        _, preds = model.apply(v, x + 0.0 * chain, 10, 5, key,
                               method="predict")
        return preds, jnp.mean(preds)

    # chained dispatches (in-jit, device scalar) + value fetch — see
    # time_step's methodology note
    out, chain = rollout(variables, x, jax.random.key(3), jnp.float32(0.0))
    float(chain)  # compile + sync
    t0 = time.perf_counter()
    for i in range(runs):
        out, chain = rollout(variables, x, jax.random.key(4 + i), chain)
    float(chain)
    return (time.perf_counter() - t0) / runs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", default="conv,auto")
    ap.add_argument("--runs", type=int, default=20)
    ap.add_argument("--batch_flow", action="store_true")
    ap.add_argument("--batch", type=int, default=None,
                    help="override the per-chip batch (default: thesis B=30)")
    ap.add_argument("--coupling_dtype", default=None,
                    choices=[None, "bfloat16"],
                    help="coupling-NN compute dtype (GlowConfig.coupling_dtype)")
    ap.add_argument("--mode", default="loss", choices=["loss", "sample"])
    ap.add_argument("--no_fold", action="store_true",
                    help="disable the weight-fold family (A/B escape hatch)")
    ap.add_argument("--packed", default="", choices=["", "sublane", "lanes"],
                    help="packed x-stream layout (GlowConfig.packed_layout)")
    ap.add_argument("--scan_unroll", type=int, default=1,
                    help="lax.scan unroll factor for the loss/predict scans")
    ap.add_argument("--chain", default="off", choices=["off", "sample", "all"],
                    help="whole-scale chain kernel (GlowConfig.chain_impl)")
    ap.add_argument("--dual", action="store_true",
                    help="dual-stream scale executor (GlowConfig.dual_stream)")
    ap.add_argument("--remat", default="default",
                    help="RFN.remat_policy override: default|none|save_flow_x|"
                         "save_flow_xc|save_flow_full|<jax policy name>")
    ap.add_argument("--ab", default=None, choices=["dual", "remat"],
                    help="interleaved in-session A/B: 'dual' = module path "
                         "vs dual_stream; 'remat' = remat_policy None vs "
                         "save_flow_x")
    args = ap.parse_args()
    _enable_cache()
    remat = (_SENTINEL if args.remat == "default"
             else None if args.remat == "none" else args.remat)
    if args.ab:
        impl = args.impls.split(",")[0]
        common = dict(batch=args.batch, scan_unroll=args.scan_unroll,
                      chain_impl=args.chain)
        if args.ab == "dual":
            base_kw = dict(dual_stream=False, remat_policy=remat)
            var_kw = dict(dual_stream=True, remat_policy=remat)
        else:
            base_kw = dict(dual_stream=args.dual, remat_policy=None)
            var_kw = dict(dual_stream=args.dual, remat_policy="save_flow_x")
        res = ab_step(impl, args.runs, base_kw, var_kw, **common)
        print(json.dumps({"ab": args.ab, "impl": impl,
                          "base": {k: str(v) for k, v in base_kw.items()},
                          "variant": {k: str(v) for k, v in var_kw.items()},
                          **res}), flush=True)
        return
    for impl in args.impls.split(","):
        if args.mode == "sample":
            dt = time_sample(impl, args.runs,
                             fold_weights=not args.no_fold,
                             packed_layout=args.packed or False,
                             scan_unroll=args.scan_unroll,
                             chain_impl=args.chain, batch=args.batch)
            bsz = args.batch or 30
            print(json.dumps({
                "impl": impl, "mode": "sample", "packed": args.packed,
                "scan_unroll": args.scan_unroll, "chain": args.chain,
                "batch": bsz,
                "rollout_ms": round(dt * 1000, 2),
                "latency_ms_per_frame": round(dt * 100, 2),
                "pred_frames_per_s": round(bsz * 10 / dt, 1),
            }), flush=True)
        else:
            dt = time_step(impl, args.runs, batch_flow=args.batch_flow,
                           batch=args.batch, fold_weights=not args.no_fold,
                           packed_layout=args.packed or False,
                           coupling_dtype=args.coupling_dtype,
                           scan_unroll=args.scan_unroll,
                           chain_impl=args.chain, dual_stream=args.dual,
                           remat_policy=remat)
            bsz = args.batch or 30
            print(json.dumps({
                "impl": impl, "packed": args.packed,
                "batch_flow": args.batch_flow, "dual": args.dual,
                "scan_unroll": args.scan_unroll, "chain": args.chain,
                "batch": bsz,
                "coupling_dtype": args.coupling_dtype,
                "loss_grad_ms": round(dt * 1000, 2),
                "steps_per_s": round(1.0 / dt, 2),
                "train_frames_per_s": round(bsz * 9 / dt, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
