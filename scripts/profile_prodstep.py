"""Decompose the production train step's 115 ms (4.9 TFLOP/s = 5% of peak).

Times the thesis-config (L=5, K=10, h=200, z=56, B=30, T=10) loss+grad
step piecewise so the round-3 roofline statement (docs/PERF.md) can point
at the actual sink instead of guessing:

  1. full loss forward only (no grad)          -> is backward the cost?
  2. full loss+grad, remat ON (the default)    -> baseline
  3. full loss+grad, remat OFF                 -> is recompute the cost?
  4. full loss+grad, remat policy=dots_saveable-> middle ground: save
     matmul/conv outputs, recompute elementwise only
  5. feature extractor alone (fwd+grad)        -> VGG share
  6. ConvLSTM unrolls alone (fwd+grad)         -> recurrence share
  7. one flow.log_prob fwd+grad at B=30        -> x9 ~= the flow share

Each variant reports wall ms (async-dispatch timing: N dispatches, one
block) and XLA cost-analysis GFLOP, so "where the time goes" and "where
the FLOPs go" can be compared directly.

Usage: python scripts/profile_prodstep.py [--runs 20] [--only 1,2,3]
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


def _chainable(fn):
    """Wrap fn(p, x, *rest) as jitted g(chain, p, x, *rest) where `chain`
    (a device scalar — the previous call's first output) is folded into x
    INSIDE the jit. Forces on-device serialization of back-to-back
    dispatches with zero host/eager traffic (block_until_ready is a no-op
    on this axon backend; eager chaining round-trips intermediates
    through the tunnel at ~1 s/iter — scripts/probe_rollout_timing.py,
    docs/PERF.md round-3 correction)."""
    @jax.jit
    def g(chain, p, x, *rest):
        out = fn(p, x + 0.0 * chain, *rest)
        # reduce over EVERY output leaf: returning only the loss lets XLA
        # dead-code-eliminate the whole backward (observed: all grad
        # variants collapsed to the 24 ms forward)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(out))

    return g


def _time_and_gflop(name, fn, args, runs):
    g = _chainable(fn)
    gflop = gbytes = None
    try:
        cost = g.lower(jnp.float32(0.0), *args).compile().cost_analysis()
        gflop = round(float(cost.get("flops", 0.0)) / 1e9, 1)
        gbytes = round(float(cost.get("bytes accessed", 0.0)) / 1e9, 2)
    except Exception:
        pass
    chain = g(jnp.float32(0.0), *args)
    float(chain)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(runs):
        chain = g(chain, *args)
    float(chain)
    ms = (time.perf_counter() - t0) / runs * 1000.0
    _report(name, ms, gflop, gbytes)


V5E_F32_PEAK_TFLOPS = 98.5
V5E_HBM_GBPS = 819.0


def _report(name, ms, gflop, gbytes=None):
    """ms + FLOPs + bytes-accessed -> achieved TFLOP/s, achieved GB/s, and
    the roofline-limited time for this op mix (max of MXU time and HBM
    time) so 'is this at speed of light?' is answered per variant."""
    tf = round(gflop / ms, 1) if (gflop and ms) else None
    row = {"variant": name, "ms": round(ms, 2), "gflop": gflop,
           "tflops_per_s": tf}
    if gbytes:
        row["gbytes_accessed"] = gbytes
        row["achieved_gbps"] = round(gbytes / ms * 1000, 0)
        roof_ms = max((gflop or 0) / V5E_F32_PEAK_TFLOPS,
                      gbytes / (V5E_HBM_GBPS / 1000.0))
        row["roofline_ms"] = round(roof_ms, 2)
        row["pct_of_roofline"] = round(100 * roof_ms / ms, 1) if ms else None
    print(json.dumps(row), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=20)
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    only = set(int(s) for s in args.only.split(",") if s) or set(range(1, 8))
    _enable_cache()

    cfg, tcfg = rfn_mnist_production()
    b, t = tcfg.batch_size, tcfg.n_frames
    x = jax.random.uniform(
        jax.random.key(0), (b, t, cfg.image_size, cfg.image_size, 1)
    ) - 0.5

    def build(remat=True, remat_policy=None):
        m = RFN(cfg, remat=remat, remat_policy=remat_policy)
        v = m.init(jax.random.key(1), x[:2], jax.random.key(2))
        return m, v

    model, variables = build()
    params = variables["params"]
    consts = variables.get("consts", {})

    def loss_of(m):
        def f(p, x, key):
            out = m.apply({"params": p, "consts": consts}, x, key,
                          method="loss")
            return out["nll"] + out["kl_free_bits"]
        return f

    if 1 in only:
        _time_and_gflop("loss fwd only (remat on)", loss_of(model),
                        (params, x, jax.random.key(3)), args.runs)

    if 2 in only:
        _time_and_gflop("loss+grad remat=on (default)",
                        jax.value_and_grad(loss_of(model)),
                        (params, x, jax.random.key(3)), args.runs)

    if 3 in only:
        m3, _ = build(remat=False)
        _time_and_gflop("loss+grad remat=off",
                        jax.value_and_grad(loss_of(m3)),
                        (params, x, jax.random.key(3)), args.runs)

    if 4 in only:
        m4, _ = build(remat=True, remat_policy="dots_saveable")
        _time_and_gflop("loss+grad remat=policy(dots_saveable)",
                        jax.value_and_grad(loss_of(m4)),
                        (params, x, jax.random.key(3)), args.runs)

    if 5 in only:
        def feats_loss(p, x):
            f, f_last = model.apply({"params": p, "consts": consts}, x,
                                    method="_features")
            s = sum(jnp.sum(fi) for fi in (f or [])) + jnp.sum(f_last)
            return s
        _time_and_gflop("features (VGG) fwd+grad",
                        jax.value_and_grad(feats_loss), (params, x),
                        args.runs)

    if 6 in only:
        def lstm_loss(p, x):
            vv = {"params": p, "consts": consts}
            _, f_last = model.apply(vv, x, method="_features")
            hs, _, _ = model.apply(vv, f_last, b, method="_unroll_h")
            s = jnp.sum(hs)
            if cfg.enable_smoothing:
                as_ = model.apply(vv, hs, f_last, b, method="_unroll_a")
                s = s + jnp.sum(as_)
            return s
        _time_and_gflop("features + h/a ConvLSTM unrolls fwd+grad",
                        jax.value_and_grad(lstm_loss), (params, x),
                        args.runs)

    if 8 in only:
        # selective remat: save the flow's per-GlowStep carries
        # (checkpoint_name 'flow_x') so the backward skips replaying the
        # 50-step SERIAL chain; coupling intermediates recompute from the
        # saved carries in parallel. ~10 MB/frame extra HBM.
        m8, _ = build(remat=True, remat_policy="save_flow_x")
        _time_and_gflop("loss+grad remat=policy(save_flow_x)",
                        jax.value_and_grad(loss_of(m8)),
                        (params, x, jax.random.key(3)), args.runs)

    if 9 in only:
        # save_flow_x + upscaler conditions ('flow_cond') + assembled 1x1 /
        # folded conv weights ('flow_w'): backward also skips the upscaler
        # replay and per-step weight re-assembly (~3 MB/frame more HBM)
        m9, _ = build(remat=True, remat_policy="save_flow_full")
        _time_and_gflop("loss+grad remat=policy(save_flow_full)",
                        jax.value_and_grad(loss_of(m9)),
                        (params, x, jax.random.key(3)), args.runs)

    if 10 in only:
        m10, _ = build(remat=True, remat_policy="save_flow_xc")
        _time_and_gflop("loss+grad remat=policy(save_flow_xc)",
                        jax.value_and_grad(loss_of(m10)),
                        (params, x, jax.random.key(3)), args.runs)

    if 7 in only:
        # one per-timestep flow NLL fwd+grad at B=30 (the scan body's flow
        # share; the full step runs this 9x fwd + 9x bwd-with-remat)
        def flow_nll(p, x2, key):
            nll = model.apply({"params": p, "consts": consts}, x2, key,
                              ddi=False, method="ddi")
            return jnp.mean(nll)
        _time_and_gflop("one-step flow log_prob fwd+grad (x9 ~= flow share)",
                        jax.value_and_grad(flow_nll),
                        (params, x[:, :2], jax.random.key(3)), args.runs)


if __name__ == "__main__":
    main()
