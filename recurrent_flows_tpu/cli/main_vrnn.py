"""VRNN training CLI — flag surface mirrors reference main_vrnn.py:49-129."""

from __future__ import annotations

import argparse

from ..config import VRNNConfig
from .common import add_bool_arg, add_data_args, add_trainer_args, run_training


def build_parser():
    p = argparse.ArgumentParser("main_vrnn")
    add_data_args(p)
    add_trainer_args(p)
    p.add_argument("--x_channels", type=int, default=1)
    p.add_argument("--h_dim", type=int, default=256)
    p.add_argument("--z_dim", type=int, default=32)
    p.add_argument("--loss_type", choices=["bernoulli", "mse", "gaussian", "mol"],
                   default="bernoulli")
    add_bool_arg(p, "dequantize", default=True)
    p.add_argument("--n_logistics", type=int, default=5)
    p.add_argument("--norm_type_model",
                   choices=["instancenorm", "batchnorm", "none"], default="batchnorm")
    return p


def config_from_args(args) -> VRNNConfig:
    return VRNNConfig(
        x_channels=args.x_channels if args.choose_data != "bair" else 3,
        image_size=args.image_size,
        h_dim=args.h_dim,
        z_dim=args.z_dim,
        loss_type=args.loss_type,
        dequantize=args.dequantize,
        n_logistics=args.n_logistics,
        n_bits=args.n_bits,
        preprocess_range=args.preprocess_range,
        norm_type=args.norm_type_model,
    )


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ..models import VRNN

    model = VRNN(config_from_args(args))
    return run_training(model, args, args.x_channels)


if __name__ == "__main__":
    main()
