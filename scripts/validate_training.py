"""TPU learning validation: train each model family on on-device
MovingMNIST and verify the loss improves. Saves curve + verdict per model.

Usage:
  python scripts/validate_training.py --model rfn --steps 400
  python scripts/validate_training.py --model srnn --steps 300
  python scripts/validate_training.py --model all --steps 300
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from recurrent_flows_tpu.config import (
    GlowConfig,
    RFNConfig,
    SRNNConfig,
    SVGConfig,
    TrainConfig,
    VRNNConfig,
)
from recurrent_flows_tpu.data import MovingMNIST
from recurrent_flows_tpu.models import RFN, SRNN, SVG, VRNN
from recurrent_flows_tpu.training import Trainer


def build(model_name: str, img: int, two_digits: bool):
    if model_name == "rfn":
        cfg = RFNConfig(
            x_channels=1, image_size=img, h_dim=64, z_dim=8, a_dim=16, L=3, K=6,
            extractor_structure=((16, "pool", 32), (32, "pool", 64), (64, "pool", 64)),
            upscaler_structure=((64, 32), ("upsample", 32, 32), ("upsample", 16, 16)),
            prior_structure=(32,), encoder_structure=(32,),
            norm_type="none", norm_type_features="none",
            glow=GlowConfig(L=3, K=6, n_units_affine=64, n_units_prior=64),
        )
        model, pr, lr = RFN(cfg), "0.5", 2e-4
    elif model_name == "srnn":
        cfg = SRNNConfig(x_channels=1, image_size=img, h_dim=64, z_dim=16,
                         a_dim=64, norm_type="none", enable_smoothing=False,
                         loss_type="bernoulli", preprocess_range="1.0")
        model, pr, lr = SRNN(cfg), "1.0", 3e-4
    elif model_name == "vrnn":
        cfg = VRNNConfig(x_channels=1, image_size=img, h_dim=64, z_dim=16,
                         norm_type="none", loss_type="bernoulli",
                         preprocess_range="1.0")
        model, pr, lr = VRNN(cfg), "1.0", 3e-4
    elif model_name == "svg":
        cfg = SVGConfig(x_channels=1, image_size=img, z_dim=8, c_features=64,
                        h_dim=128, norm_type="none", loss_type="mse")
        model, pr, lr = SVG(cfg), "none", 1e-3
    elif model_name == "glow":
        # unconditional Glow on SM-MNIST frames (BASELINE config 3)
        from recurrent_flows_tpu.models.glow_image import GlowImage

        cfg = GlowConfig(L=3, K=8, n_units_affine=128, n_units_prior=128)
        model = GlowImage(1, img, cfg, cond_channels=8, base_channels=8)
        pr, lr = "0.5", 2e-4
    else:
        raise ValueError(model_name)
    return model, pr, lr


def run_one(model_name: str, args) -> dict:
    img = args.image_size
    model, pr, lr = build(model_name, img, args.two_digits)
    beta = 1e-4 if model_name == "svg" else 1.0
    tcfg = TrainConfig(
        batch_size=args.batch_size, n_frames=args.n_frames,
        steps_per_epoch=args.steps, n_epochs=1,
        beta_steps=max(args.steps // 2, 1), learning_rate=lr,
        preprocess_range=pr, beta_max=beta,
        beta_min=beta if model_name == "svg" else 1e-7,
        n_conditions=3, n_predictions=3,
    )
    ds = MovingMNIST(seq_len=args.n_frames, image_size=img,
                     digit_size=img // 2,
                     num_digits=2 if args.two_digits else 1)
    out_dir = os.path.join(args.out, model_name)
    tr = Trainer(model, tcfg, ds, out_dir).build()
    t0 = time.time()
    tr.train_epoch(steps=args.steps)
    wall = time.time() - t0
    # bits/dim for likelihood models; raw loss for svg/mse
    hist = np.asarray(tr.bits_hist)
    first, last = float(hist[:20].mean()), float(hist[-20:].mean())
    verdict = dict(
        model=model_name, steps=args.steps, metric="bits_per_dim",
        first20=first, last20=last, improved=bool(last < first * 0.95),
        wall_s=wall, wall_steps_per_s=args.steps / wall,
    )
    with open(os.path.join(out_dir, "verdict.json"), "w") as f:
        json.dump(verdict, f, indent=2)
    try:
        tr.plotter()
    except Exception as e:
        print("plotter failed:", e)
    print(json.dumps(verdict))
    return verdict


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="rfn",
                   choices=["rfn", "srnn", "vrnn", "svg", "glow", "all"])
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--image_size", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--n_frames", type=int, default=6)
    p.add_argument("--two_digits", action="store_true")
    p.add_argument("--out", default="runs/validate")
    args = p.parse_args()
    models = ["rfn", "srnn", "vrnn", "svg"] if args.model == "all" else [args.model]
    verdicts = [run_one(m, args) for m in models]
    assert all(v["improved"] for v in verdicts), verdicts


if __name__ == "__main__":
    main()
