"""Export a trained checkpoint's predict program to a StableHLO artifact.

Deployment counterpart to the training/eval CLIs: packages preprocess ->
autoregressive rollout -> postprocess (weights embedded) into one
self-contained file servable by ``recurrent_flows_tpu.serving
.load_exported`` or any StableHLO runtime — no model code or checkpoint
needed at serving time. See serving.Predictor.export.

    python export_serving.py --checkpoint runs/rfn/model_folder/last \
        --out rfn_predict.stablehlo --batch_size 8
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True,
                    help="checkpoint dir (e.g. <run>/model_folder/last)")
    ap.add_argument("--out", required=True, help="output artifact path")
    ap.add_argument("--batch_size", type=int, required=True,
                    help="fixed serving batch size baked into the artifact")
    ap.add_argument("--n_conditions", type=int, default=5)
    ap.add_argument("--n_predictions", type=int, default=10)
    ap.add_argument("--temperature", type=float, default=None)
    ap.add_argument("--image_size", type=int, default=None,
                    help="default: the checkpoint config's image_size")
    ap.add_argument("--channels", type=int, default=None)
    ap.add_argument("--platforms", default=None,
                    help="comma-separated lowering targets, e.g. 'tpu,cpu' "
                         "(default: the current backend)")
    args = ap.parse_args(argv)

    from ..serving import Predictor

    pred = Predictor.from_checkpoint(
        args.checkpoint, n_conditions=args.n_conditions,
        n_predictions=args.n_predictions, temperature=args.temperature,
    )
    platforms = tuple(args.platforms.split(",")) if args.platforms else None
    blob = pred.export(args.out, batch_size=args.batch_size,
                       image_size=args.image_size, channels=args.channels,
                       platforms=platforms)
    print(f"wrote {args.out} ({len(blob)} bytes, batch={args.batch_size}, "
          f"predict {args.n_predictions} from {args.n_conditions})")


if __name__ == "__main__":
    main()
