"""Train the flagship production RFN (thesis SM-MNIST config) end-to-end.

Reproduces the round-3 flagship run (reference job script
RFN/default_rfn_job.sh:5-19): 36M-param L=5/K=10 RFN on 64x64
MovingMNIST, B=30 x T=10, 25k steps (50 epochs x 500), beta annealed to
1.0 over 10k steps. Checkpoints land in <out>/model_folder (orbax,
resume-capable via --resume).

Usage:
  python scripts/train_prod.py --out runs/prod_r4 [--epochs 50]
  python scripts/train_prod.py --out runs/prod_r4 --resume   # continue
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recurrent_flows_tpu.configs import rfn_mnist_production
from recurrent_flows_tpu.data import MovingMNIST
from recurrent_flows_tpu.models import RFN
from recurrent_flows_tpu.training import Trainer
from recurrent_flows_tpu.utils.compilation_cache import enable as _enable_cache


def main() -> None:
    p = argparse.ArgumentParser("train_prod")
    p.add_argument("--out", default="runs/prod_r4")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--steps_per_epoch", type=int, default=500)
    p.add_argument("--checkpoint_every", type=int, default=5)
    p.add_argument("--resume", action="store_true")
    args = p.parse_args()

    _enable_cache()
    cfg, tcfg = rfn_mnist_production()
    tcfg = dataclasses.replace(
        tcfg,
        n_epochs=args.epochs,
        steps_per_epoch=args.steps_per_epoch,
        checkpoint_every=args.checkpoint_every,
    )
    data = MovingMNIST(
        seq_len=tcfg.n_frames,
        image_size=cfg.image_size,
        digit_size=tcfg.digit_size,
        num_digits=tcfg.num_digits,
        step_length=tcfg.step_length,
    )
    print(f"[data] MovingMNIST digit bank: {data.bank_kind}", flush=True)
    os.makedirs(os.path.join(args.out, "model_folder"), exist_ok=True)
    with open(os.path.join(args.out, "model_folder", "status.txt"), "a") as f:
        f.write(f"data_source moving_mnist bank={data.bank_kind}\n")

    tr = Trainer(RFN(cfg), tcfg, data, args.out).build()
    ckpt = os.path.join(args.out, "model_folder", "last", "meta.json")
    if args.resume and os.path.exists(ckpt):
        tr.load("last")
        print("[resume] continuing from", ckpt, flush=True)
    tr.fit()


if __name__ == "__main__":
    main()
