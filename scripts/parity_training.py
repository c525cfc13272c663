#!/usr/bin/env python
"""Training-curve parity: our RFN vs the PyTorch reference on identical data.

Trains both frameworks from IDENTICAL weights (ours copied into the
reference model) on an IDENTICAL fixed batch stream with matched Adam
(lr, betas (0.9, 0.999)), recording per-step bits/dim exactly as the
reference trainer does (RFN/trainer.py:206-219). Writes an overlay plot to
docs/artifacts/parity_curves.png and the raw curves to
docs/artifacts/parity_curves.json. (VERDICT r1 item #2.)

Run: JAX_PLATFORMS=cpu python scripts/parity_training.py [--steps 500]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))


def run_trajectories(n_steps: int, batch: int, t: int, lr: float, seed: int = 0):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    import torch

    import rfn_parity_utils as pu

    model, variables, tmodel = pu.build_pair(batch, t, seed=seed)
    dims = pu.IMG * pu.IMG * pu.CIN
    denom = math.log(2.0) * dims * (t - 1)

    # fixed batch stream, identical for both: moving-digit sequences
    # (synthetic bank), preprocessed to 8-bit pixel centers in [-0.5, 0.5]
    # (reference trainer preprocess_range=0.5)
    from recurrent_flows_tpu.data import MovingMNIST

    ds = MovingMNIST(seq_len=t, image_size=pu.IMG, digit_size=8, num_digits=1)
    stream = []
    for i in range(n_steps):
        x = ds.sample(jax.random.key(1000 + i), batch)
        stream.append(np.asarray(jnp.floor(x * 255.0) / 256.0 - 0.5))

    # ---- ours: jitted loss+grad+adam ------------------------------------
    tx_opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = tx_opt.init(variables["params"])

    @jax.jit
    def step(params, opt_state, x, key):
        def total(p):
            out = model.apply({"params": p, "consts": variables["consts"]},
                              x, key, method="loss")
            return out["nll"] + out["kl_free_bits"], out

        (loss, out), grads = jax.value_and_grad(total, has_aux=True)(params)
        updates, opt_state = tx_opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        bits = (out["kl"] + out["nll"]) / denom
        return params, opt_state, bits

    params = variables["params"]
    ours_bits = []
    t0 = time.time()
    for i, x in enumerate(stream):
        params, opt_state, bits = step(params, opt_state, jnp.asarray(x),
                                       jax.random.key(2000 + i))
        ours_bits.append(float(bits))
    ours_wall = time.time() - t0

    # ---- reference: torch CPU -------------------------------------------
    topt = torch.optim.Adam(tmodel.parameters(), lr=lr)
    tmodel.train()
    ref_bits = []
    t0 = time.time()
    for i, x in enumerate(stream):
        tx = torch.tensor(x.transpose(0, 1, 4, 2, 3))
        kl_fb, kl, nll = tmodel.loss(tx, logdet=0.0)
        loss = nll + kl_fb  # beta = 1
        topt.zero_grad()
        loss.backward()
        topt.step()
        ref_bits.append(float((kl.detach() + nll.detach()) / denom))
    ref_wall = time.time() - t0

    return dict(ours_bits=ours_bits, ref_bits=ref_bits,
                ours_wall_s=ours_wall, ref_wall_s=ref_wall,
                n_steps=n_steps, batch=batch, t=t, lr=lr)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--t", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()

    res = run_trajectories(args.steps, args.batch, args.t, args.lr)
    out_dir = os.path.join(_REPO, "docs", "artifacts")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "parity_curves.json"), "w") as f:
        json.dump(res, f)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    o, r = np.array(res["ours_bits"]), np.array(res["ref_bits"])

    def smooth(a, k=15):
        return np.convolve(a, np.ones(k) / k, mode="valid")

    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(o, alpha=0.25, color="C0")
    ax.plot(r, alpha=0.25, color="C1")
    ax.plot(np.arange(len(smooth(o))) + 7, smooth(o), color="C0",
            label=f"ours (JAX, wall {res['ours_wall_s']:.0f}s)")
    ax.plot(np.arange(len(smooth(r))) + 7, smooth(r), color="C1",
            label=f"reference (torch CPU, wall {res['ref_wall_s']:.0f}s)")
    ax.set_xlabel("step")
    ax.set_ylabel("bits/dim")
    ax.set_title("RFN training parity: identical weights, data, Adam "
                 f"(B={res['batch']}, T={res['t']}, lr={res['lr']})")
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "parity_curves.png"), dpi=120)
    tail_o, tail_r = o[-50:].mean(), r[-50:].mean()
    print(json.dumps(dict(tail_ours=tail_o, tail_ref=tail_r,
                          rel_diff=abs(tail_o - tail_r) / abs(tail_r),
                          ours_wall_s=res["ours_wall_s"],
                          ref_wall_s=res["ref_wall_s"])))


if __name__ == "__main__":
    main()
