"""Honest A/B re-measurement of the rollout-path perf knobs.

Rounds 1-2 graded compute_dtype=bf16, RFT_PALLAS partial kernels, and
coupling_impl on async-dispatch timings that scripts/probe_rollout_timing.py
later proved measured host enqueue rate (block_until_ready is a no-op on
this backend), so every rollout-path A/B verdict is re-run here with the
validated slope method: per variant, R in {2, 12} rollouts inside one
lax.fori_loop dispatch, scalar fetched by value; device ms/rollout is the
slope, the ~40 ms link constant cancels.

Variants (KTH-size bench config, B=8, 16 predicted frames — bench.py's
exact workload):
  f32        default (the bench headline)
  bf16       compute_dtype=jnp.bfloat16 on extractor/upscaler/LSTMs
  pallas     RFT_PALLAS=1 partial fused kernels (set the env var BEFORE
             running this script: RFT_PALLAS=1 python ... --variants pallas)
  fused      coupling_impl='fused' whole-GlowStep Pallas kernel
  conv       coupling_impl='conv' (auto's current resolution)

Usage: python scripts/bench_rollout_ab.py [--variants f32,bf16,fused]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH  # noqa: E402


def build(variant):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from recurrent_flows_tpu.config import GlowConfig, RFNConfig
    from recurrent_flows_tpu.models import RFN
    from recurrent_flows_tpu.utils.compilation_cache import enable as _cache

    _cache()
    b = BENCH
    glow = GlowConfig(L=b["L"], K=b["K"], n_units_affine=b["n_units_affine"],
                      n_units_prior=b["n_units_prior"])
    if variant in ("fused", "conv"):
        glow = dataclasses.replace(glow, coupling_impl=variant)
    cfg = RFNConfig(
        x_channels=b["channels"], image_size=b["image_size"],
        h_dim=b["h_dim"], z_dim=b["z_dim"], a_dim=b["a_dim"],
        L=b["L"], K=b["K"],
        extractor_structure=b["extractor"], upscaler_structure=b["upscaler"],
        prior_structure=b["prior_structure"],
        encoder_structure=b["encoder_structure"],
        norm_type="none", norm_type_features="none", glow=glow,
    )
    dtype = jnp.bfloat16 if variant == "bf16" else None
    model = RFN(cfg, remat=False, compute_dtype=dtype)
    bs = b["batch_size"]
    x = jax.random.uniform(
        jax.random.key(0),
        (bs, b["n_conditions"], b["image_size"], b["image_size"], 1),
    ) - 0.5
    variables = model.init(jax.random.key(1), x, jax.random.key(2))
    return jax, jnp, model, variables, x, b


def measure(variant, trials=5):
    jax, jnp, model, variables, x, b = build(variant)
    frames = b["batch_size"] * b["n_predictions"]
    R_LO, R_HI = 2, 12

    def make_loop(R):
        @jax.jit
        def loop(v, x, key):
            def body(i, acc):
                p = model.apply(v, x, b["n_predictions"], b["n_conditions"],
                                jax.random.fold_in(key, i),
                                method="predict")[1]
                return acc + jnp.sum(p.astype(jnp.float32))
            return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))
        return loop

    ms = {}
    for R in (R_LO, R_HI):
        loop = make_loop(R)
        val = float(loop(variables, x, jax.random.key(3)))
        assert val == val, "NaN from device loop"
        ts = []
        for i in range(trials):
            t0 = time.perf_counter()
            float(loop(variables, x, jax.random.key(100 + i)))
            ts.append((time.perf_counter() - t0) * 1000)
        ms[R] = sorted(ts)[len(ts) // 2]
    slope = (ms[R_HI] - ms[R_LO]) / (R_HI - R_LO)
    return dict(variant=variant,
                device_ms_per_rollout=round(slope, 2),
                device_fps=round(frames / slope * 1000, 1),
                ms_lo=round(ms[R_LO], 1), ms_hi=round(ms[R_HI], 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="f32,bf16,fused")
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args()
    for v in args.variants.split(","):
        try:
            print(json.dumps(measure(v, args.trials)), flush=True)
        except Exception as e:
            print(json.dumps({"variant": v, "error": str(e)}), flush=True)


if __name__ == "__main__":
    main()
