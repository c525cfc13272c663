"""Serving Predictor: checkpoint -> compiled inference round trip."""

import jax
import numpy as np

from recurrent_flows_tpu.config import TrainConfig
from recurrent_flows_tpu.data import MovingMNIST
from recurrent_flows_tpu.models import RFN
from recurrent_flows_tpu.serving import Predictor
from recurrent_flows_tpu.training import Trainer

from test_rfn import tiny_cfg  # noqa: E402


def test_predictor_from_checkpoint(tmp_path):
    cfg = tiny_cfg()
    tcfg = TrainConfig(batch_size=2, n_frames=4, steps_per_epoch=1,
                       beta_steps=10)
    ds = MovingMNIST(seq_len=4, image_size=16, digit_size=8, num_digits=1)
    tr = Trainer(RFN(cfg, remat=False), tcfg, ds, str(tmp_path)).build(run_ddi=False)
    tr.train_epoch(steps=1)
    tr.checkpoint("last")

    pred = Predictor.from_checkpoint(
        str(tmp_path / "model_folder" / "last"), n_conditions=2, n_predictions=3
    )
    pred.warmup(batch_size=2, image_size=16, channels=1)
    ctx = np.asarray(ds.sample(jax.random.key(0), 2))
    out = pred.predict(ctx)
    assert out.shape == (2, 3, 16, 16, 1)
    assert out.min() >= 0.0 and out.max() <= 1.0
    rec = pred.reconstruct(ctx)
    assert rec.shape == (2, 3, 16, 16, 1)
    s = pred.sample(ctx[:, 0], 4)
    assert s.shape == (2, 4, 16, 16, 1)


def test_export_roundtrip(tmp_path):
    """Predictor.export -> StableHLO artifact -> load_exported reproduces
    the in-process program exactly (same seed), no model code in the
    serving call path."""
    from recurrent_flows_tpu.serving import load_exported

    cfg = tiny_cfg()
    model = RFN(cfg, remat=False)
    ds = MovingMNIST(seq_len=4, image_size=16, digit_size=8, num_digits=1)
    x0 = np.asarray(ds.sample(jax.random.key(0), 2))
    variables = model.init(jax.random.key(1), x0[:, :2], jax.random.key(2))
    tcfg = TrainConfig(batch_size=2, n_frames=4)
    pred = Predictor(model, variables, tcfg, n_conditions=2, n_predictions=3)

    path = str(tmp_path / "rfn_predict.stablehlo")
    blob = pred.export(path, batch_size=2, image_size=16, channels=1)
    assert len(blob) > 1000

    serve = load_exported(path)
    ctx = x0[:, :2].astype(np.float32)
    out = np.asarray(serve(ctx, 7))
    assert out.shape == (2, 3, 16, 16, 1)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # bit-reproducible vs a second load from the raw bytes
    out2 = np.asarray(load_exported(blob)(ctx, 7))
    np.testing.assert_array_equal(out, out2)
    # and vs the in-process Predictor program with the same key
    xm = pred._to_model_space(ctx)
    direct = pred._to_image_space(
        pred._predict(variables, xm, jax.random.key(np.int32(7))))
    np.testing.assert_allclose(out, direct, atol=1e-6)


def test_export_cli(tmp_path):
    """export_serving CLI: checkpoint -> artifact file -> servable."""
    from recurrent_flows_tpu.cli.export_serving import main as export_main
    from recurrent_flows_tpu.serving import load_exported

    cfg = tiny_cfg()
    tcfg = TrainConfig(batch_size=2, n_frames=4, steps_per_epoch=1,
                       beta_steps=10)
    ds = MovingMNIST(seq_len=4, image_size=16, digit_size=8, num_digits=1)
    tr = Trainer(RFN(cfg, remat=False), tcfg, ds,
                 str(tmp_path)).build(run_ddi=False)
    tr.train_epoch(steps=1)
    tr.checkpoint("last")

    out = str(tmp_path / "rfn.stablehlo")
    export_main(["--checkpoint", str(tmp_path / "model_folder" / "last"),
                 "--out", out, "--batch_size", "2",
                 "--n_conditions", "2", "--n_predictions", "3"])
    serve = load_exported(out)
    ctx = np.asarray(ds.sample(jax.random.key(0), 2))[:, :2]
    pred_frames = np.asarray(serve(ctx.astype(np.float32), 3))
    assert pred_frames.shape == (2, 3, 16, 16, 1)
