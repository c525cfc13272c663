#!/usr/bin/env python
"""Probe: SRNN/VRNN long-horizon seed-to-seed loss bands, ours vs torch.

VERDICT r4 next #7 groundwork: trajectory parity stops at steps 0-1
(torch CPU nondeterminism); the replacement is a DISTRIBUTIONAL pin —
train K seeds per side from identical weights/data (only the sampling
noise differs per seed), compare tail-window mean losses. This probe
measures the bands so tests/test_distributional_parity.py can assert
with honest tolerances.

Run: JAX_PLATFORMS=cpu python scripts/probe_distributional_band.py
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

N_STEPS, TAIL, BATCH, T, LR = 60, 15, 4, 4, 1e-3


def run(kind: str, ref_seeds=(0, 1, 2, 3), our_seeds=(10, 11, 12)):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    import torch

    import dense_parity_utils as du
    from recurrent_flows_tpu.data import MovingMNIST

    ds = MovingMNIST(seq_len=T, image_size=du.IMG,
                     digit_size=max(du.IMG // 2, 8), num_digits=1)
    stream = [np.asarray(jnp.floor(ds.sample(jax.random.key(1000 + i), BATCH)
                                   * 255.0) / 256.0)
              for i in range(N_STEPS)]

    def ours_tail(noise_seed: int) -> float:
        model, variables, _, _ = du.build_pair(kind, BATCH, T, seed=0)
        tx_opt = optax.adam(LR, b1=0.9, b2=0.999, eps=1e-8)
        opt_state = tx_opt.init(variables["params"])

        @jax.jit
        def step(params, opt_state, x, key):
            def total(p):
                out = model.apply({"params": p}, x, key, method="loss")
                return out["nll"] + out["kl"]

            loss, grads = jax.value_and_grad(total)(params)
            updates, opt_state = tx_opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        params, losses = variables["params"], []
        for i, x in enumerate(stream):
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(x),
                jax.random.fold_in(jax.random.key(noise_seed), i))
            losses.append(float(loss))
        return float(np.mean(losses[-TAIL:]))

    def ref_tail(noise_seed: int) -> float:
        _, _, tmodel, _ = du.build_pair(kind, BATCH, T, seed=0)
        torch.manual_seed(noise_seed)
        topt = torch.optim.Adam(tmodel.parameters(), lr=LR)
        tmodel.train()
        losses = []
        for x in stream:
            tx = torch.tensor(x.transpose(0, 1, 4, 2, 3))
            kl, nll = tmodel.loss(tx)
            loss = nll + kl
            topt.zero_grad()
            loss.backward()
            topt.step()
            losses.append(float(loss.detach()))
        return float(np.mean(losses[-TAIL:]))

    t0 = time.time()
    ref = [ref_tail(s) for s in ref_seeds]
    t_ref = time.time() - t0
    t0 = time.time()
    ours = [ours_tail(s) for s in our_seeds]
    t_ours = time.time() - t0
    import numpy as np
    return dict(kind=kind, ref_tails=ref, our_tails=ours,
                ref_mean=float(np.mean(ref)), ref_std=float(np.std(ref)),
                our_mean=float(np.mean(ours)), our_std=float(np.std(ours)),
                ref_wall_s=round(t_ref, 1), our_wall_s=round(t_ours, 1))


if __name__ == "__main__":
    out = {k: run(k) for k in ("srnn", "vrnn")}
    print(json.dumps(out, indent=2))
