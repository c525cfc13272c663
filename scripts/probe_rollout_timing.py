"""Decide whether the rollout bench measures device compute or the link.

Round-3 finding to adjudicate: with a validated value fetch, the headline
rollout measures ~5.2k frames/s, while rounds 1-2's async-dispatch timing
reported 98k-170k. One of these measured the link, not the device. The
decisive experiment: time the device-side loop (R rollouts in ONE
lax.fori_loop dispatch, result fetched by value) for several R. The
per-trial wall fits wall = a + b*R where a = link/dispatch constant and
b = TRUE device ms/rollout. If b ~= 23 ms, today's 5.2k f/s is honest
compute speed; if b ~= 1 ms, the old numbers were right and today is a
backend regression.

Also times one plain rollout dispatch with (i) block_until_ready and
(ii) a value fetch, to show whether block actually blocks on this
backend.

Usage: python scripts/probe_rollout_timing.py [--Rs 1,2,5,10,20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import BENCH, measure_ours  # reuse the exact bench model  # noqa


def build():
    import jax

    from recurrent_flows_tpu.config import GlowConfig, RFNConfig
    from recurrent_flows_tpu.models import RFN
    from recurrent_flows_tpu.utils.compilation_cache import enable as _cache

    _cache()
    b = BENCH
    cfg = RFNConfig(
        x_channels=b["channels"], image_size=b["image_size"],
        h_dim=b["h_dim"], z_dim=b["z_dim"], a_dim=b["a_dim"],
        L=b["L"], K=b["K"],
        extractor_structure=b["extractor"], upscaler_structure=b["upscaler"],
        prior_structure=b["prior_structure"],
        encoder_structure=b["encoder_structure"],
        norm_type="none", norm_type_features="none",
        glow=GlowConfig(L=b["L"], K=b["K"],
                        n_units_affine=b["n_units_affine"],
                        n_units_prior=b["n_units_prior"]),
    )
    model = RFN(cfg, remat=False)
    bs = b["batch_size"]
    x = jax.random.uniform(
        jax.random.key(0),
        (bs, b["n_conditions"], b["image_size"], b["image_size"], 1),
    ) - 0.5
    variables = model.init(jax.random.key(1), x, jax.random.key(2))
    return jax, model, variables, x, b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--Rs", default="1,2,5,10,20")
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()
    jax, model, variables, x, b = build()
    import jax.numpy as jnp

    frames = b["batch_size"] * b["n_predictions"]

    @jax.jit
    def rollout(v, x, key):
        _, preds = model.apply(v, x, b["n_predictions"], b["n_conditions"],
                               key, method="predict")
        return preds

    # --- single-dispatch: block vs value fetch -------------------------
    preds = rollout(variables, x, jax.random.key(3))
    preds.block_until_ready()
    for mode in ("block", "fetch"):
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            p = rollout(variables, x, jax.random.key(50 + i))
            if mode == "block":
                p.block_until_ready()
            else:
                float(jnp.sum(p))
            ts.append((time.perf_counter() - t0) * 1000)
        print(json.dumps({"probe": f"single_rollout_{mode}",
                          "ms_trials": [round(t, 1) for t in ts]}),
              flush=True)

    # --- R-scaling of the device-side loop -----------------------------
    rows = []
    for R in [int(s) for s in args.Rs.split(",")]:
        @jax.jit
        def rollout_loop(v, x, key, R=R):
            def body(i, acc):
                p = model.apply(v, x, b["n_predictions"], b["n_conditions"],
                                jax.random.fold_in(key, i),
                                method="predict")[1]
                return acc + jnp.sum(p)
            return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

        float(rollout_loop(variables, x, jax.random.key(3)))  # compile
        ts = []
        for i in range(args.trials):
            t0 = time.perf_counter()
            v = float(rollout_loop(variables, x, jax.random.key(100 + i)))
            ts.append((time.perf_counter() - t0) * 1000)
        med = sorted(ts)[len(ts) // 2]
        rows.append((R, med))
        print(json.dumps({"probe": "loop", "R": R,
                          "ms_trials": [round(t, 1) for t in ts],
                          "ms_median": round(med, 1),
                          "fps_implied": round(frames * R / (med / 1000), 1)}),
              flush=True)

    if len(rows) >= 2:
        Rs = np.array([r for r, _ in rows], float)
        ms = np.array([m for _, m in rows], float)
        bfit, afit = np.polyfit(Rs, ms, 1)
        print(json.dumps({
            "probe": "fit wall = a + b*R",
            "a_link_const_ms": round(float(afit), 2),
            "b_device_ms_per_rollout": round(float(bfit), 2),
            "device_fps": round(frames / float(bfit) * 1000, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
