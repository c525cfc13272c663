"""One-epoch production-config probe to bisect a training-quality regression.

Round 4: the fresh 25k prod run converged to 0.648 bits vs round 3's
0.3985 with epoch-1 bits 1.49 vs the validated 1.23 — something that
landed after the Aug-17 fold-validation changed the trajectory. Run one
epoch (500 steps) with a knob toggled and compare epoch-1 bits.

Usage: python scripts/probe_regression.py --variant {default,nofold,plainremat,oldfold}
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recurrent_flows_tpu.configs import rfn_mnist_production
from recurrent_flows_tpu.data import MovingMNIST
from recurrent_flows_tpu.models import RFN
from recurrent_flows_tpu.training import Trainer


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="default",
                   choices=["default", "nofold", "plainremat", "nofold_plain"])
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    cfg, tcfg = rfn_mnist_production()
    tcfg = dataclasses.replace(tcfg, seed=args.seed)
    if args.variant in ("nofold", "nofold_plain"):
        cfg = dataclasses.replace(
            cfg, glow=dataclasses.replace(cfg.glow, fold_weights=False))
    model_kw = {}
    if args.variant in ("plainremat", "nofold_plain"):
        model_kw["remat_policy"] = None  # plain full remat (pre-r4 default)
    tcfg = dataclasses.replace(tcfg, n_epochs=1, steps_per_epoch=args.steps)

    data = MovingMNIST(seq_len=tcfg.n_frames, image_size=cfg.image_size,
                       digit_size=tcfg.digit_size, num_digits=tcfg.num_digits,
                       step_length=tcfg.step_length)
    with tempfile.TemporaryDirectory() as tmp:
        tr = Trainer(RFN(cfg, **model_kw), tcfg, data, tmp).build()
        tr.train_epoch(steps=args.steps)
        import numpy as np
        bits = float(np.mean(tr.bits_hist))
        last100 = float(np.mean(tr.bits_hist[-100:]))
        print(f"PROBE variant={args.variant} seed={args.seed} steps={args.steps} "
              f"epoch_bits={bits:.4f} last100_bits={last100:.4f}", flush=True)


if __name__ == "__main__":
    main()
