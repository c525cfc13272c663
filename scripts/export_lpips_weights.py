#!/usr/bin/env python
"""Export AlexNet-LPIPS weights to the npz the JAX scorer loads.

Run on a NETWORKED machine with the `lpips` package installed, then copy
the ~9 MB npz to ./data/lpips_alex.npz (or point RFT_LPIPS_WEIGHTS at it).

    pip install lpips torchvision
    python scripts/export_lpips_weights.py

Verified on load by recurrent_flows_tpu/evaluation/alexnet_lpips.py
(key/shape validation).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(out: str) -> None:
    import lpips as lp
    import torch

    net = lp.LPIPS(net="alex")
    params = {
        "scaling/shift": net.scaling_layer.shift.numpy().reshape(3),
        "scaling/scale": net.scaling_layer.scale.numpy().reshape(3),
    }
    convs = [m for m in net.net.slice1.modules() if isinstance(m, torch.nn.Conv2d)]
    for sl in (net.net.slice2, net.net.slice3, net.net.slice4, net.net.slice5):
        convs += [m for m in sl.modules() if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == 5, f"expected 5 convs, got {len(convs)}"
    for i, conv in enumerate(convs):
        params[f"conv{i + 1}/w"] = (
            conv.weight.detach().numpy().transpose(2, 3, 1, 0).astype(np.float32)
        )
        params[f"conv{i + 1}/b"] = conv.bias.detach().numpy().astype(np.float32)
    for i, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
        params[f"lin{i}/w"] = w.reshape(-1).astype(np.float32)

    np.savez_compressed(out, **params)
    sys.path.insert(0, ".")
    from recurrent_flows_tpu.evaluation import alexnet_lpips

    alexnet_lpips.load_params(out)  # validates
    print(f"wrote {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="data/lpips_alex.npz")
    main(ap.parse_args().out)
