"""Training parity vs the PyTorch reference (VERDICT r1 item #2).

Three tiers, all on a weight-copied tiny RFN (tests/rfn_parity_utils.py):

1. Deterministic LOSS parity: identical weights + identical injected noise
   -> our RFN.loss and reference RFN.loss agree to f32 tolerance, for the
   base config and the smoothing / res_q variants.
2. Deterministic GRADIENT parity: d(loss)/d(params) agrees tensor-by-tensor
   (jax.grad vs loss.backward) — pins training *semantics*, not just the
   forward pass (reference RFN/trainer.py:206-219, loss = nll + beta*kl_fb).
3. Training-TRAJECTORY parity (slow): both frameworks train from identical
   weights on an identical fixed batch stream with matched Adam; bits/dim
   curves must track within tolerance.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import rfn_parity_utils as pu  # noqa: E402

B, T = 2, 4


def _fixed_batch(seed=7, batch=B, t=T):
    x = jax.random.uniform(jax.random.key(seed), (batch, t, pu.IMG, pu.IMG, pu.CIN))
    # quantize to 8-bit pixel centers in [-0.5, 0.5] (reference preprocess)
    x = jnp.floor(x * 255.0) / 256.0 - 0.5
    return np.asarray(x)


def _both_losses(cfg_overrides, seed=0):
    model, variables, tmodel = pu.build_pair(B, T, seed=seed, **cfg_overrides)
    rng = jax.random.key(42)
    x = _fixed_batch()
    ours = model.apply(variables, jnp.asarray(x), rng, method="loss")
    ours = {k: float(v) for k, v in ours.items()}
    pe, ee, dq = pu.our_loss_noise(rng, B, T)
    tmodel.eval()
    with pu.NoiseInjector(tmodel, pe, ee, dq):
        with torch.no_grad():
            theirs = pu.ref_loss(tmodel, x)
    return ours, theirs


@pytest.mark.parametrize(
    "overrides",
    [
        {},
        {"enable_smoothing": True},
        {"res_q": True},
        {"free_bits": 0.5},
    ],
    ids=["base", "smoothing", "res_q", "free_bits"],
)
def test_loss_parity(overrides):
    ours, theirs = _both_losses(overrides)
    for k in ("kl_free_bits", "kl", "nll"):
        np.testing.assert_allclose(ours[k], theirs[k], rtol=2e-5, atol=5e-3,
                                   err_msg=k)


def test_grad_parity():
    """d(nll + kl_free_bits)/d(params) matches tensor-by-tensor."""
    model, variables, tmodel = pu.build_pair(B, T, seed=0)
    rng = jax.random.key(42)
    x = jnp.asarray(_fixed_batch())

    def total(params):
        out = model.apply({"params": params, "consts": variables["consts"]},
                          x, rng, method="loss")
        return out["nll"] + out["kl_free_bits"]

    grads = jax.grad(total)(variables["params"])

    pe, ee, dq = pu.our_loss_noise(rng, B, T)
    tmodel.train()
    with pu.NoiseInjector(tmodel, pe, ee, dq):
        kl_fb, kl, nll = tmodel.loss(
            torch.tensor(np.asarray(x).transpose(0, 1, 4, 2, 3)), logdet=0.0)
        (nll + kl_fb).backward()

    checks = [
        # (ours NHWC kernel grad, torch conv weight grad) across subsystems
        (grads["extractor"]["b0_1"]["kernel"],
         tmodel.extractor.l_nets[0][0].weight.grad, True),
        (grads["upscaler"]["b0_1"]["kernel"],
         tmodel.upscaler.l_nets[0][0].weight.grad, True),
        (grads["lstm"]["gates"]["kernel"],
         tmodel.lstm.LSTMlayer.conv[0].weight.grad, True),
        (grads["prior"]["param_conv"]["kernel"],
         tmodel.prior.param_net.weight.grad, True),
        (grads["encoder"]["param_conv"]["kernel"],
         tmodel.encoder.param_net.weight.grad, True),
        (grads["flow"]["scale0_step0"]["affine"]["net0"]["conv"]["kernel"],
         tmodel.flow.glow_frame[1].affine.net[0].conv.weight.grad, True),
        (grads["flow"]["prior_out"]["conv"]["kernel"],
         tmodel.flow.prior[4].conv.weight.grad, True),
        (grads["h_0"], tmodel.h_0.grad, False),
    ]
    for i, (ours_g, theirs_g, is_conv) in enumerate(checks):
        og = np.asarray(ours_g)
        tg = theirs_g.numpy()
        if is_conv:
            tg = tg.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        else:
            # ours [1,h,w,c] vs theirs [bs,c,h,w] (batch-tiled init states):
            # theirs accumulates over the batch copies
            tg = tg.sum(axis=0, keepdims=True).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(og, tg, rtol=5e-3, atol=2e-5,
                                   err_msg=f"grad check {i}")


@pytest.mark.slow
def test_training_trajectory_parity():
    """Both frameworks train ~150 steps on identical data from identical
    weights; smoothed bits/dim trajectories must agree."""
    sys.path.insert(0, ".")
    from scripts.parity_training import run_trajectories

    res = run_trajectories(n_steps=150, batch=4, t=T, lr=1e-3, seed=0)
    ours, theirs = np.array(res["ours_bits"]), np.array(res["ref_bits"])
    assert ours[-20:].mean() < ours[:20].mean(), "ours did not learn"
    assert theirs[-20:].mean() < theirs[:20].mean(), "reference did not learn"
    # smoothed curves agree: compare tail means and a mid checkpoint
    for sl in (slice(40, 70), slice(-30, None)):
        a, b = ours[sl].mean(), theirs[sl].mean()
        assert abs(a - b) / abs(b) < 0.08, (sl, a, b)
