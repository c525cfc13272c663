#!/usr/bin/env python
"""Training-curve parity for SRNN / VRNN / SVG vs the PyTorch reference.

Companion to scripts/parity_training.py (RFN): trains both frameworks from
IDENTICAL weights on an IDENTICAL fixed batch stream with matched Adam,
recording per-step loss (nll + kl, the reference trainers' objective at
beta=1 — SRNN/trainer.py:193-206). Writes overlay plots + raw curves to
docs/artifacts/parity_dense_curves.{png,json}. (VERDICT r2 item #1.)

Run: JAX_PLATFORMS=cpu python scripts/parity_dense_training.py \
        [--kinds srnn,vrnn,svg] [--steps 150]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))


def run_trajectories(kind: str, n_steps: int, batch: int, t: int, lr: float,
                     seed: int = 0):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    import torch

    from recurrent_flows_tpu.data import MovingMNIST

    if kind == "svg":
        import svg_parity_utils as su

        model, variables, tmodel, cfg = su.build_pair(
            batch, t, seed=seed, norm_type="none", loss_type="mse")
        su.strip_batchnorm(tmodel)
        img, cin = su.IMG, su.CIN
    else:
        import dense_parity_utils as du

        model, variables, tmodel, cfg = du.build_pair(kind, batch, t, seed=seed)
        img, cin = du.IMG, du.CIN

    ds = MovingMNIST(seq_len=t, image_size=img, digit_size=max(img // 2, 8),
                     num_digits=1)
    stream = []
    for i in range(n_steps):
        x = ds.sample(jax.random.key(1000 + i), batch)
        stream.append(np.asarray(jnp.floor(x * 255.0) / 256.0))

    # ---- ours: jitted loss+grad+adam ------------------------------------
    tx_opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = tx_opt.init(variables["params"])

    @jax.jit
    def step(params, opt_state, x, key):
        def total(p):
            out = model.apply({"params": p}, x, key, method="loss")
            return out["nll"] + out["kl"]

        loss, grads = jax.value_and_grad(total)(params)
        updates, opt_state = tx_opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    params = variables["params"]
    ours_loss = []
    t0 = time.time()
    for i, x in enumerate(stream):
        params, opt_state, loss = step(params, opt_state, jnp.asarray(x),
                                       jax.random.key(2000 + i))
        ours_loss.append(float(loss))
    ours_wall = time.time() - t0

    # ---- reference: torch CPU -------------------------------------------
    if kind == "svg":
        import svg_parity_utils as su

        su.patch_ref_std_semantics(tmodel)
    topt = torch.optim.Adam(tmodel.parameters(), lr=lr)
    tmodel.train()
    ref_loss = []
    t0 = time.time()
    for i, x in enumerate(stream):
        tx = torch.tensor(x.transpose(0, 1, 4, 2, 3))
        kl, nll = tmodel.loss(tx)
        loss = nll + kl
        topt.zero_grad()
        loss.backward()
        topt.step()
        ref_loss.append(float(loss.detach()))
    ref_wall = time.time() - t0

    return dict(kind=kind, ours_loss=ours_loss, ref_loss=ref_loss,
                ours_wall_s=ours_wall, ref_wall_s=ref_wall,
                n_steps=n_steps, batch=batch, t=t, lr=lr)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--kinds", type=str, default="srnn,vrnn,svg")
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--svg_steps", type=int, default=80)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--t", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()

    kinds = args.kinds.split(",")
    results = {}
    for kind in kinds:
        steps = args.svg_steps if kind == "svg" else args.steps
        batch = 2 if kind == "svg" else args.batch
        t = 3 if kind == "svg" else args.t
        print(f"[{kind}] {steps} steps ...", flush=True)
        results[kind] = run_trajectories(kind, steps, batch, t, args.lr)

    out_dir = os.path.join(_REPO, "docs", "artifacts")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "parity_dense_curves.json"), "w") as f:
        json.dump(results, f)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    fig, axes = plt.subplots(1, len(kinds), figsize=(6 * len(kinds), 4.5))
    if len(kinds) == 1:
        axes = [axes]
    summary = {}
    for ax, kind in zip(axes, kinds):
        res = results[kind]
        o, r = np.array(res["ours_loss"]), np.array(res["ref_loss"])

        def smooth(a, k=9):
            return np.convolve(a, np.ones(k) / k, mode="valid")

        ax.plot(o, alpha=0.25, color="C0")
        ax.plot(r, alpha=0.25, color="C1")
        ax.plot(np.arange(len(smooth(o))) + 4, smooth(o), color="C0",
                label=f"ours (JAX, {res['ours_wall_s']:.0f}s)")
        ax.plot(np.arange(len(smooth(r))) + 4, smooth(r), color="C1",
                label=f"reference (torch, {res['ref_wall_s']:.0f}s)")
        ax.set_title(f"{kind.upper()} (B={res['batch']}, T={res['t']})")
        ax.set_xlabel("step")
        ax.set_ylabel("loss (nll + kl)")
        ax.legend()
        tail_o, tail_r = o[-20:].mean(), r[-20:].mean()
        summary[kind] = dict(tail_ours=float(tail_o), tail_ref=float(tail_r),
                             rel_diff=float(abs(tail_o - tail_r) / abs(tail_r)))
    fig.suptitle("Training parity: identical weights, data stream, Adam")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "parity_dense_curves.png"), dpi=120)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
