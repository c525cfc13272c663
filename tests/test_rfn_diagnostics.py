"""RFN diagnostic APIs: param_analysis, probability_future,
reconstruct_elbo_gap, latent interpolation support."""

import jax
import jax.numpy as jnp
import numpy as np

from recurrent_flows_tpu.models import RFN

from test_rfn import B, IMG, T, make, tiny_cfg  # noqa: E402


def test_param_analysis_shapes():
    cfg = tiny_cfg()
    model, v, x = make(cfg)
    out = model.apply(v, x, jax.random.key(0), method="param_analysis")
    hu = IMG // 2 ** cfg.L
    assert out["mu_p"].shape == (T - 1, B, hu, hu, cfg.z_dim)
    assert out["std_q"].shape == (T - 1, B, hu, hu, cfg.z_dim)
    assert out["predictions"].shape == (T - 1, B, IMG, IMG, 1)
    assert np.all(np.isfinite(np.asarray(out["mu_flow"])))


def test_probability_future():
    cfg = tiny_cfg()
    model, v, x = make(cfg)
    nlls = model.apply(v, x, 2, jax.random.key(0), method="probability_future")
    assert nlls.shape == (B, 2, T - 2)
    assert np.all(np.isfinite(np.asarray(nlls)))


def test_reconstruct_elbo_gap():
    cfg = tiny_cfg()
    model, v, x = make(cfg)
    recons, recons_flow, kld, nll_seq = model.apply(
        v, x, jax.random.key(0), method="reconstruct_elbo_gap"
    )
    assert recons.shape == (T - 1, 2, B, IMG, IMG, 1)
    assert kld.shape == (T - 1, B)
    assert nll_seq.shape == (2, T - 1, B)
    assert np.all(np.asarray(kld) >= -1e-4)


def test_latent_interpolation_api():
    cfg = tiny_cfg()
    model, v, x = make(cfg)
    zt, ht, skips = model.apply(v, x, 3, jax.random.key(0),
                                method="get_zt_ht_from_seq")
    # interpolate latents between two sequences and decode
    zt2, ht2, _ = model.apply(v, jnp.roll(x, 1, axis=0), 3, jax.random.key(1),
                              method="get_zt_ht_from_seq")
    for alpha in (0.0, 0.5, 1.0):
        zi = (1 - alpha) * zt + alpha * zt2
        hi = (1 - alpha) * ht + alpha * ht2
        frame = model.apply(v, zi, hi, skips, jax.random.key(2),
                            method="predicts_from_zt_ht")
        assert frame.shape == (B, IMG, IMG, 1)
        assert np.all(np.isfinite(np.asarray(frame)))
