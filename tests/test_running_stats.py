"""torch-style batchnorm running averages (reference model.eval() parity).

Reference: Utils/modules.py:28-41 (NormLayer -> nn.BatchNorm2d, whose
running stats torch updates in train mode and uses in eval mode, e.g.
evaluation_metrics/error_metrics.py:70 `self.model.eval()`). Here the
stats live in the 'batch_stats' collection, EMA-update on mutable applies
(outside scans), and engage when the model is built with eval_norm=True.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recurrent_flows_tpu.config import GlowConfig, RFNConfig
from recurrent_flows_tpu.models import RFN
from recurrent_flows_tpu.nn.layers import NormLayer


@pytest.mark.fast
def test_normlayer_tracks_and_uses_running_stats():
    layer = NormLayer("batchnorm", track_running_stats=True, momentum=0.1)
    x = jax.random.normal(jax.random.key(0), (8, 4, 4, 3)) * 2.0 + 5.0
    v = layer.init(jax.random.key(1), x)
    assert "batch_stats" in v
    # mutable apply updates the EMA toward batch stats
    _, upd = layer.apply(v, x, mutable=["batch_stats"])
    rm = upd["batch_stats"]["running_mean"]
    bm = jnp.mean(x, axis=(0, 1, 2))
    np.testing.assert_allclose(np.asarray(rm), np.asarray(0.1 * bm),
                               rtol=1e-5, atol=1e-6)
    # non-mutable apply leaves stats untouched and still normalizes by batch
    y_batch = layer.apply(v, x)
    np.testing.assert_allclose(np.asarray(jnp.mean(y_batch, axis=(0, 1, 2))),
                               0.0, atol=1e-5)
    # eval mode: normalize with the stored (init: mean 0, var 1) stats
    y_eval = layer.apply(v, x, True)
    np.testing.assert_allclose(np.asarray(y_eval), np.asarray(x),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.fast
def test_normlayer_default_has_no_batch_stats():
    layer = NormLayer("batchnorm")
    x = jax.random.normal(jax.random.key(0), (4, 4, 4, 3))
    v = layer.init(jax.random.key(1), x)
    assert "batch_stats" not in v


def _tiny_cfg(track: bool) -> RFNConfig:
    return RFNConfig(
        x_channels=1, image_size=16, h_dim=16, z_dim=4, a_dim=8, L=2, K=2,
        extractor_structure=((8, "pool", 16), (16, "pool", 16)),
        upscaler_structure=((16,), ("upsample", 8)),
        prior_structure=(8,), encoder_structure=(8,),
        norm_type="batchnorm", norm_type_features="batchnorm",
        track_running_stats=track,
        glow=GlowConfig(L=2, K=2, n_units_affine=16, n_units_prior=16),
    )


@pytest.mark.slow
def test_rfn_running_stats_roundtrip():
    """Train-mode refresh updates stats; eval_norm model consumes them."""
    cfg = _tiny_cfg(track=True)
    model = RFN(cfg, remat=False)
    x = jax.random.uniform(jax.random.key(0), (2, 4, 16, 16, 1)) - 0.5
    v = model.init(jax.random.key(1), x, jax.random.key(2))
    assert "batch_stats" in v
    # at init the flow's zero-convs make couplings/base condition-independent
    # (preds would be insensitive to the norm stats); perturb params so the
    # conditioning pathway is live
    v = {**v, "params": jax.tree.map(lambda a: a + 0.01, v["params"])}

    # out-of-scan refresh (what Trainer.refresh_stats does)
    _, upd = model.apply(v, x, jax.random.key(3), method="stats_refresh",
                         mutable=["batch_stats"])
    before = jax.tree.leaves(v["batch_stats"])
    after = jax.tree.leaves(upd["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(after, before)
    ), "refresh must move at least one running stat"

    v2 = {**v, "batch_stats": upd["batch_stats"]}
    # loss (train mode) is insensitive to the stats; predict with eval_norm
    # uses them end-to-end without error
    out = model.apply(v2, x, jax.random.key(4), method="loss")
    assert np.isfinite(float(out["nll"]))
    eval_model = RFN(cfg, remat=False, eval_norm=True)
    _, preds = eval_model.apply(v2, x, 2, 2, jax.random.key(5),
                                method="predict")
    assert np.isfinite(np.asarray(preds)).all()
    # and the stats change the eval-mode prediction pathway
    _, preds_batchstats = model.apply(v2, x, 2, 2, jax.random.key(5),
                                      method="predict")
    assert not np.allclose(np.asarray(preds), np.asarray(preds_batchstats))


@pytest.mark.fast
def test_rfn_untracked_is_unchanged():
    """Default (track off): no batch_stats collection, loss identical to
    the pre-feature code path."""
    cfg = _tiny_cfg(track=False)
    model = RFN(cfg, remat=False)
    x = jax.random.uniform(jax.random.key(0), (2, 3, 16, 16, 1)) - 0.5
    v = model.init(jax.random.key(1), x, jax.random.key(2))
    assert "batch_stats" not in v
    out = model.apply(v, x, jax.random.key(3), method="loss")
    assert np.isfinite(float(out["nll"]))


@pytest.mark.fast
@pytest.mark.parametrize("family", ["srnn", "vrnn", "svg"])
@pytest.mark.slow
def test_dense_models_running_stats(family):
    """SRNN/VRNN/SVG: tracking creates batch_stats, stats_refresh moves
    them, eval_norm applies end-to-end (same contract as RFN)."""
    from recurrent_flows_tpu.config import SRNNConfig, SVGConfig, VRNNConfig
    from recurrent_flows_tpu.models import SRNN, SVG, VRNN

    if family == "srnn":
        cfg = SRNNConfig(image_size=16, h_dim=16, z_dim=4, a_dim=8,
                         track_running_stats=True)
        cls = SRNN
    elif family == "vrnn":
        cfg = VRNNConfig(image_size=16, h_dim=16, z_dim=4,
                         track_running_stats=True)
        cls = VRNN
    else:
        cfg = SVGConfig(image_size=16, z_dim=4, c_features=16, h_dim=32,
                        track_running_stats=True)
        cls = SVG
    model = cls(cfg, remat=False)
    x = jax.random.uniform(jax.random.key(0), (2, 4, 16, 16, 1))
    v = model.init(jax.random.key(1), x, jax.random.key(2))
    assert "batch_stats" in v
    _, upd = model.apply(v, x, jax.random.key(3), method="stats_refresh",
                         mutable=["batch_stats"])
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(upd["batch_stats"]),
                        jax.tree.leaves(v["batch_stats"]))
    )
    assert moved, "refresh must move at least one running stat"
    v2 = {**v, "batch_stats": upd["batch_stats"]}
    eval_model = cls(cfg, remat=False, eval_norm=True)
    _, preds = eval_model.apply(v2, x, 2, 2, jax.random.key(4),
                                method="predict")
    assert np.isfinite(np.asarray(preds)).all()
