#!/usr/bin/env python
"""Export I3D Kinetics-400 weights to the npz the JAX embedder loads.

Run on a NETWORKED machine (this repo's hosts have zero egress), then copy
the ~50 MB npz to ./data/i3d_kinetics400.npz (or point RFT_I3D_WEIGHTS at
it). Two sources supported:

  --from-hub            TF-Hub module https://tfhub.dev/deepmind/i3d-kinetics-400/1
  --from-ckpt PATH      deepmind/kinetics-i3d TF checkpoint (data/checkpoints/rgb_imagenet)

The JAX side (recurrent_flows_tpu/evaluation/i3d.py) validates keys/shapes
on load, so a successful export is verified by:
    python -c "from recurrent_flows_tpu.evaluation import i3d; \
               i3d.load_params('data/i3d_kinetics400.npz')"
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def from_hub(out: str) -> None:
    import tensorflow_hub as hub

    module = hub.load("https://tfhub.dev/deepmind/i3d-kinetics-400/1")
    params = {}
    for v in module.variables:
        name = v.name.rsplit(":", 1)[0]
        params[name] = np.asarray(v.numpy(), np.float32)
    _save(params, out)


def from_ckpt(path: str, out: str) -> None:
    import tensorflow as tf

    reader = tf.train.load_checkpoint(path)
    params = {}
    for name in reader.get_variable_to_shape_map():
        params[name] = np.asarray(reader.get_tensor(name), np.float32)
    _save(params, out)


def _save(params: dict, out: str) -> None:
    sys.path.insert(0, ".")
    from recurrent_flows_tpu.evaluation import i3d

    want = set(i3d.expected_keys())
    have = {k: v for k, v in params.items() if k in want}
    missing = want - set(have)
    if missing:
        raise SystemExit(f"checkpoint missing {len(missing)} expected vars, "
                         f"e.g. {sorted(missing)[:3]}; found keys like "
                         f"{sorted(params)[:3]}")
    np.savez_compressed(out, **have)
    i3d.load_params(out)  # validates shapes
    print(f"wrote {out} ({len(have)} tensors)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="data/i3d_kinetics400.npz")
    ap.add_argument("--from-ckpt", default=None)
    args = ap.parse_args()
    if args.from_ckpt:
        from_ckpt(args.from_ckpt, args.out)
    else:
        from_hub(args.out)
