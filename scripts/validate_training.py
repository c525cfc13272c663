"""TPU learning validation: train RFN on on-device MovingMNIST and verify
bits/dim drops. Saves the curve + verdict to runs/validate/.

Usage: python scripts/validate_training.py [--steps 400] [--image_size 32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from recurrent_flows_tpu.config import GlowConfig, RFNConfig, TrainConfig
from recurrent_flows_tpu.data import MovingMNIST
from recurrent_flows_tpu.models import RFN
from recurrent_flows_tpu.training import Trainer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--image_size", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--out", default="runs/validate")
    args = p.parse_args()

    img = args.image_size
    cfg = RFNConfig(
        x_channels=1,
        image_size=img,
        h_dim=64,
        z_dim=8,
        a_dim=16,
        L=3,
        K=6,
        extractor_structure=((16, "pool", 32), (32, "pool", 64), (64, "pool", 64)),
        upscaler_structure=((64, 32), ("upsample", 32, 32), ("upsample", 16, 16)),
        prior_structure=(32,),
        encoder_structure=(32,),
        norm_type="none",
        norm_type_features="none",
        glow=GlowConfig(L=3, K=6, n_units_affine=64, n_units_prior=64),
    )
    tcfg = TrainConfig(
        batch_size=args.batch_size,
        n_frames=6,
        steps_per_epoch=args.steps,
        n_epochs=1,
        beta_steps=max(args.steps // 2, 1),
        learning_rate=2e-4,
        n_conditions=3,
        n_predictions=3,
    )
    ds = MovingMNIST(seq_len=6, image_size=img, digit_size=img // 2, num_digits=1)
    tr = Trainer(RFN(cfg), tcfg, ds, args.out).build()
    t0 = time.time()
    tr.train_epoch(steps=args.steps)
    wall = time.time() - t0
    bits = np.asarray(tr.bits_hist)
    first = float(bits[:20].mean())
    last = float(bits[-20:].mean())
    verdict = dict(
        steps=args.steps,
        bits_first20=first,
        bits_last20=last,
        improved=bool(last < first - 0.1),
        wall_s=wall,
        step_stats=tr.step_timer.stats(),
    )
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "verdict.json"), "w") as f:
        json.dump(verdict, f, indent=2)
    try:
        tr.plotter()
    except Exception as e:
        print("plotter failed:", e)
    print(json.dumps(verdict))
    assert verdict["improved"], "bits/dim did not improve!"


if __name__ == "__main__":
    main()
