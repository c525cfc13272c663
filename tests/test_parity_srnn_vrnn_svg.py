"""Model-level torch parity for SRNN / VRNN / SVG (VERDICT r2 item #1).

Same ladder as the RFN suite (test_parity_training.py), per family:

1. Deterministic LOSS parity — identical weights + identical injected
   noise -> our loss and the reference loss agree to f32 tolerance, across
   every likelihood and feature variant (smoothing / res_q / overshooting).
2. Deterministic GRADIENT parity — d(nll + kl)/d(params) agrees
   tensor-by-tensor across every subsystem.
3. Documented-deviation quantification — the reference's IW-ELBO bound
   (SRNN.py:482-579), SVG's std-vs-logvar units bug (SVG.py:176-179,
   266-271), and the batchnorm batch-stat scope get side-by-side NUMBERS,
   not just prose (docs/PARITY.md).
4. Training-TRAJECTORY parity (slow) — identical weights, data, Adam;
   loss curves must track (scripts/parity_dense_training.py).

Reference counterparts: SRNN/SRNN.py:210-338, VRNN/VRNN.py:191-244,
SVG/SVG.py:233-271.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import dense_parity_utils as du  # noqa: E402
import svg_parity_utils as su  # noqa: E402

B, T = 2, 4


def _batch(img, cin, t=T, seed=7):
    x = jax.random.uniform(jax.random.key(seed), (B, t, img, img, cin))
    return np.asarray(jnp.floor(x * 255.0) / 256.0)  # 8-bit centers in [0,1)


# --- tier 1: loss parity -----------------------------------------------------


@pytest.mark.parametrize(
    "kind,overrides",
    [
        ("srnn", {}),
        ("srnn", {"enable_smoothing": True}),
        ("srnn", {"res_q": True}),
        ("srnn", {"D": 2}),
        ("srnn", {"loss_type": "gaussian"}),
        ("srnn", {"loss_type": "mse"}),
        ("srnn", {"loss_type": "mol"}),
        ("vrnn", {}),
        ("vrnn", {"loss_type": "gaussian"}),
        ("vrnn", {"loss_type": "mol"}),
    ],
    ids=["srnn", "srnn-smooth", "srnn-resq", "srnn-overshoot", "srnn-gauss",
         "srnn-mse", "srnn-mol", "vrnn", "vrnn-gauss", "vrnn-mol"],
)
def test_loss_parity_dense(kind, overrides):
    model, variables, tmodel, cfg = du.build_pair(kind, B, T, **overrides)
    tmodel.eval()
    rng = jax.random.key(42)
    x = _batch(du.IMG, du.CIN)
    ours = {k: float(v)
            for k, v in model.apply(variables, jnp.asarray(x), rng,
                                    method="loss").items()}
    if kind == "vrnn":
        ee, dq = du.vrnn_loss_noise(rng, cfg, B, T)
        queue = list(ee)
    else:
        ee, pe, dq, oe = du.srnn_loss_noise(rng, cfg, B, T)
        queue = du.srnn_ref_queue(cfg, ee, pe, oe, T)
    with du.DenseNoiseInjector(tmodel, queue, dq):
        with torch.no_grad():
            theirs = du.ref_loss(tmodel, x)
    for k in ("kl", "nll"):
        np.testing.assert_allclose(ours[k], theirs[k], rtol=3e-5, atol=5e-3,
                                   err_msg=k)


@pytest.mark.parametrize("loss_type", ["mse", "bernoulli", "gaussian"])
def test_loss_parity_svg(loss_type):
    """Exact parity with batchnorm off (see strip_batchnorm docstring) and
    the reference patched to consistent std semantics."""
    t = 3
    model, variables, tmodel, cfg = su.build_pair(
        B, t, norm_type="none", loss_type=loss_type)
    su.strip_batchnorm(tmodel)
    tmodel.train()
    rng = jax.random.key(42)
    x = _batch(su.IMG, su.CIN, t=t)
    ours = {k: float(v)
            for k, v in model.apply(variables, jnp.asarray(x), rng,
                                    method="loss").items()}
    eps = su.svg_loss_noise(rng, cfg, B, t)
    with torch.no_grad():
        theirs = su.ref_loss(tmodel, x, eps, std_semantics=True)
    for k in ("kl", "nll"):
        np.testing.assert_allclose(ours[k], theirs[k], rtol=3e-5, atol=5e-3,
                                   err_msg=k)


# --- tier 2: gradient parity -------------------------------------------------


def _conv_g(tgrad):
    return tgrad.numpy().transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _deconv_g(tgrad):
    # torch ConvTranspose2d [in,out,kh,kw] -> flax [kh,kw,in,out], unflipped
    return np.ascontiguousarray(
        tgrad.numpy().transpose(2, 3, 0, 1)[::-1, ::-1])


def _lin_g(tgrad):
    return tgrad.numpy().T  # [out,in] -> [in,out]


def _check(pairs, tol=1e-3):
    for i, (ours_g, theirs_g) in enumerate(pairs):
        a, b = np.asarray(ours_g), np.asarray(theirs_g)
        # global agreement: the whole tensor matches in L2
        rel_l2 = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)
        assert rel_l2 < tol, f"grad check {i}: rel L2 {rel_l2:.2e}"
        # elementwise agreement for >=99.9% of elements (isolated nonlinearity
        # kink subgradients / f32 accumulation order differ on a handful of
        # near-zero elements of multi-million-entry deep-conv grads)
        atol = max(3e-5, 1e-3 * float(np.abs(b).max()))
        viol = np.abs(a - b) > (atol + 5 * tol * np.abs(b))
        assert viol.mean() < 1e-3, (
            f"grad check {i}: {viol.mean():.2%} of elements out of tolerance")


@pytest.mark.parametrize("kind", ["srnn", "vrnn"])
def test_grad_parity_dense(kind):
    overrides = {"enable_smoothing": True} if kind == "srnn" else {}
    model, variables, tmodel, cfg = du.build_pair(kind, B, T, **overrides)
    rng = jax.random.key(42)
    x = jnp.asarray(_batch(du.IMG, du.CIN))

    def total(params):
        out = model.apply({"params": params}, x, rng, method="loss")
        return out["nll"] + out["kl"]

    grads = jax.grad(total)(variables["params"])

    if kind == "vrnn":
        ee, dq = du.vrnn_loss_noise(rng, cfg, B, T)
        queue = list(ee)
    else:
        ee, pe, dq, oe = du.srnn_loss_noise(rng, cfg, B, T)
        queue = du.srnn_ref_queue(cfg, ee, pe, oe, T)
    tmodel.train()
    with du.DenseNoiseInjector(tmodel, queue, dq):
        kl, nll = tmodel.loss(
            torch.tensor(np.asarray(x).transpose(0, 1, 4, 2, 3)))
        (nll.mean() + kl).backward()

    lstm_name = "lstm" if kind == "vrnn" else "lstm_h"
    tlstm = tmodel.lstm if kind == "vrnn" else tmodel.lstm_h
    perm = du._phi_z_perm(du.HU, du.HU, du.PHI_Z_CH)
    pairs = [
        (grads["phi_x"]["conv0"]["kernel"],
         _conv_g(tmodel.phi_x_t[0].weight.grad)),
        (grads["phi_x"]["conv3"]["kernel"],
         _conv_g(tmodel.phi_x_t[9].weight.grad)),
        # fc1's output features are permuted (UnFlatten c-major vs our h-major)
        (np.asarray(grads["phi_z"]["fc1"]["kernel"]).T[perm],
         tmodel.phi_z[2].weight.grad.numpy()),
        (grads["phi_z"]["conv"]["kernel"], _conv_g(tmodel.phi_z[5].weight.grad)),
        (grads["enc"]["trunk_conv"]["kernel"], _conv_g(tmodel.enc[0].weight.grad)),
        (grads["enc"]["mean_fc2"]["kernel"], _lin_g(tmodel.enc_mean[4].weight.grad)),
        (grads["enc"]["std_fc0"]["kernel"], _lin_g(tmodel.enc_std[0].weight.grad)),
        (grads["prior"]["mean_fc2"]["kernel"],
         _lin_g(tmodel.prior_mean[4].weight.grad)),
        (grads["dec"]["deconv0"]["kernel"], _deconv_g(tmodel.dec[0].weight.grad)),
        (grads["dec"]["conv1"]["kernel"], _conv_g(tmodel.dec[3].weight.grad)),
        (grads["head"]["out_conv"]["kernel"],
         _conv_g(tmodel.dec_mean[0].weight.grad)),
        (grads[lstm_name]["gates"]["kernel"],
         _conv_g(tlstm.LSTMlayer.conv[0].weight.grad)),
        # (head.variance only gets gradients under the gaussian likelihood)
        # batch-tiled init states: theirs accumulates over batch copies
        (grads["h_0"],
         tmodel.h_0.grad.sum(0, keepdim=True).numpy().transpose(0, 2, 3, 1)),
        (grads["z_0x"], tmodel.z_0x.grad.sum(0, keepdim=True).numpy()),
    ]
    if kind == "srnn":
        pairs.append((grads["lstm_a"]["gates"]["kernel"],
                      _conv_g(tmodel.lstm_a.LSTMlayer.conv[0].weight.grad)))
    # tol 3e-3: the earliest-layer conv grads sit at the two frameworks'
    # JOINT f32 backward noise floor (measured rel-L2 up to 1.2e-3 run-to-
    # run — torch CPU f32 backward and XLA:CPU both reassociate reductions;
    # the SVG test quantifies this by grading against an f64 reference)
    _check(pairs, tol=3e-3)


def test_grad_parity_svg():
    """SVG is deep enough (20+ conv layers of backward with vanishing
    cotangents) that torch's OWN f32 grads carry ~2e-2 relative rounding
    noise on the early-layer tensors — so the oracle here is the reference
    run in FLOAT64, and ours-f32 must sit at its own f32 noise floor
    (verified 7x closer to the f64 oracle than torch-f32 is)."""
    t = 3
    model, variables, tmodel, cfg = su.build_pair(B, t, norm_type="none")
    su.strip_batchnorm(tmodel)
    rng = jax.random.key(42)
    x = jnp.asarray(_batch(su.IMG, su.CIN, t=t))

    def total(params):
        out = model.apply({"params": params}, x, rng, method="loss")
        return out["nll"] + out["kl"]

    grads = jax.grad(total)(variables["params"])

    tmodel.double()
    eps = su.svg_loss_noise(rng, cfg, B, t)
    su.inject_gaussian_lstm(tmodel.posterior, list(eps), std_semantics=True,
                            dtype=torch.float64)
    su.inject_gaussian_lstm(
        tmodel.prior, [np.zeros_like(e) for e in eps], std_semantics=True,
        dtype=torch.float64)
    su.patch_ref_std_semantics(tmodel)
    tmodel.train()
    # init_hidden() allocates fresh zeros at loss() start — make them f64
    torch.set_default_dtype(torch.float64)
    try:
        kl, nll = tmodel.loss(torch.tensor(
            np.asarray(x, np.float64).transpose(0, 1, 4, 2, 3)))
        (nll + kl).backward()
    finally:
        torch.set_default_dtype(torch.float32)

    hd = cfg.h_dim
    fp_k = np.asarray(grads["frame_predictor"]["cell0"]["gates"]["kernel"])
    pairs = [
        (grads["encoder"]["c0_0_conv"]["kernel"],
         _conv_g(tmodel.encoder.c1[0].main[0].weight.grad)),
        (grads["encoder"]["c3_2_conv"]["kernel"],
         _conv_g(tmodel.encoder.c4[2].main[0].weight.grad)),
        (grads["encoder"]["bottleneck"]["kernel"],
         _conv_g(tmodel.encoder.c5[0].weight.grad)),
        (grads["decoder"]["up0"]["kernel"],
         _deconv_g(tmodel.decoder.upc1[0].weight.grad)),
        (grads["decoder"]["d2_1_conv"]["kernel"],
         _conv_g(tmodel.decoder.upc3[1].main[0].weight.grad)),
        # our out conv maps to the reference's k3 s1 ConvTranspose (flipped)
        (grads["decoder"]["out_conv"]["kernel"],
         _deconv_g(tmodel.decoder.out[1].weight.grad)),
        (fp_k[:hd], _lin_g(tmodel.frame_predictor.lstm[0].weight_ih.grad)),
        (fp_k[hd:], _lin_g(tmodel.frame_predictor.lstm[0].weight_hh.grad)),
        (grads["frame_predictor"]["embed"]["kernel"],
         _lin_g(tmodel.frame_predictor.embed.weight.grad)),
        (grads["posterior"]["mu"]["kernel"],
         _lin_g(tmodel.posterior.mu_net.weight.grad)),
        (grads["posterior"]["std"]["kernel"],
         _lin_g(tmodel.posterior.std_net[0].weight.grad)),
        (grads["prior"]["mu"]["kernel"],
         _lin_g(tmodel.prior.mu_net.weight.grad)),
    ]
    # ours-f32 vs the f64 oracle: bounded by OUR f32 accumulation noise
    _check(pairs, tol=8e-3)


# --- tier 3: documented deviations, quantified -------------------------------


def test_svg_logvar_deviation_quantified():
    """The reference treats softplus(linear) as a LOG-VARIANCE when
    reparameterizing/KLing (SVG.py:176-179,266-271); we treat it as a std.
    Same weights, same eps: the two semantics give materially different KLs
    while the std-patched reference matches us exactly."""
    t = 3
    model, variables, tmodel, cfg = su.build_pair(B, t, norm_type="none")
    su.strip_batchnorm(tmodel)
    rng = jax.random.key(42)
    x = _batch(su.IMG, su.CIN, t=t)
    ours = {k: float(v)
            for k, v in model.apply(variables, jnp.asarray(x), rng,
                                    method="loss").items()}
    eps = su.svg_loss_noise(rng, cfg, B, t)
    with torch.no_grad():
        ref_std = su.ref_loss(tmodel, x, eps, std_semantics=True)
    # fresh copy for the unpatched (logvar) run
    _, _, tmodel2, _ = su.build_pair(B, t, norm_type="none")
    su.strip_batchnorm(tmodel2)
    with torch.no_grad():
        ref_logvar = su.ref_loss(tmodel2, x, eps, std_semantics=False)

    np.testing.assert_allclose(ours["kl"], ref_std["kl"], rtol=3e-5, atol=5e-3)
    kl_gap = abs(ref_logvar["kl"] - ref_std["kl"]) / (abs(ref_std["kl"]) + 1e-12)
    assert kl_gap > 0.05, (
        "expected a material KL gap between the reference's logvar "
        f"semantics and the corrected std semantics; got {kl_gap:.2%}")
    print(f"\nSVG std-vs-logvar deviation (same weights/eps): "
          f"ours kl={ours['kl']:.6f} nll={ours['nll']:.3f} | "
          f"ref(std-patched) kl={ref_std['kl']:.6f} nll={ref_std['nll']:.3f} | "
          f"ref(as-written, logvar) kl={ref_logvar['kl']:.6f} "
          f"nll={ref_logvar['nll']:.3f} -> kl gap {kl_gap:.1%}")


def test_svg_batchnorm_scope_deviation_quantified():
    """Our TPU-first loss encodes all B*T frames in ONE batchnorm batch;
    the reference encodes one B-sized frame batch per call. Same weights,
    same eps, batchnorm ON: the losses differ by the batch-stat scope.
    This quantifies that documented deviation."""
    t = 3
    model, variables, tmodel, cfg = su.build_pair(B, t, norm_type="batchnorm")
    tmodel.train()
    rng = jax.random.key(42)
    x = _batch(su.IMG, su.CIN, t=t)
    ours = {k: float(v)
            for k, v in model.apply(variables, jnp.asarray(x), rng,
                                    method="loss").items()}
    eps = su.svg_loss_noise(rng, cfg, B, t)
    with torch.no_grad():
        theirs = su.ref_loss(tmodel, x, eps, std_semantics=True)
    nll_rel = abs(ours["nll"] - theirs["nll"]) / abs(theirs["nll"])
    assert nll_rel < 0.05, "BN scope should perturb, not transform, the loss"
    print(f"\nSVG batchnorm-scope deviation (B*T joint vs per-frame stats): "
          f"ours nll={ours['nll']:.3f} kl={ours['kl']:.6f} | "
          f"ref nll={theirs['nll']:.3f} kl={theirs['kl']:.6f} "
          f"-> nll rel diff {nll_rel:.2%}")


def test_srnn_iw_elbo_bound_deviation():
    """The reference IW 'ELBO' sums +NLL (not the log-likelihood) inside
    the logsumexp and mixes prior/posterior samples (SRNN.py:570-576), so
    its value is not a lower bound. Ours implements the standard IWAE
    bound. Side-by-side on identical weights/data: ours is consistent with
    the (parity-pinned) ELBO, the reference's is wildly different."""
    model, variables, tmodel, cfg = du.build_pair("srnn", B, T)
    rng = jax.random.key(42)
    x = _batch(du.IMG, du.CIN)

    out = model.apply(variables, jnp.asarray(x), rng, method="loss")
    elbo_neg = float(out["nll"] + out["kl"])  # -ELBO (nats, batch-mean)
    ours_iw = float(model.apply(variables, jnp.asarray(x), 8, rng,
                                method="elbo_importance_weighting"))
    torch.manual_seed(0)
    tmodel.eval()
    with torch.no_grad():
        ref_iw = float(tmodel.elbo_importance_weighting(
            torch.tensor(np.asarray(x, np.float32).transpose(0, 1, 4, 2, 3)),
            8))
    # IWAE bound is tighter: -IW <= -ELBO (allow MC slack)
    assert ours_iw <= elbo_neg * 1.02
    # the reference's accounting puts +NLL inside the logsumexp -> its
    # magnitude bears no relation to the ELBO
    ref_gap = abs(ref_iw - elbo_neg) / abs(elbo_neg)
    ours_gap = abs(ours_iw - elbo_neg) / abs(elbo_neg)
    assert ref_gap > 10 * max(ours_gap, 1e-6), (ref_iw, ours_iw, elbo_neg)
    print(f"\nSRNN IW-ELBO deviation: -ELBO={elbo_neg:.2f}, ours IW(K=8)="
          f"{ours_iw:.2f} (gap {ours_gap:.1%}), reference IW(K=8)={ref_iw:.2f} "
          f"(gap {ref_gap:.0%} — not a bound)")


# --- tier 4: training-trajectory parity (slow) ------------------------------


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["srnn", "vrnn"])
def test_training_trajectory_parity_dense(kind):
    """Early-phase curve tracking. The trajectories are chaotic after the
    first big loss drop (~step 4): the torch REFERENCE is itself run-to-run
    nondeterministic on CPU at this scale (measured: identical invocations
    of run_trajectories gave ref[5:30].mean of 240.9 vs 145.5 — thread-count
    -dependent reduction order compounds through the recurrence into the
    documented z-usage bifurcation, basins ~60 vs ~220-250 nats; see
    docs/artifacts/parity_dense_curves.json vs PARITY.md 'trajectory
    bifurcation'). Ours is bit-reproducible across runs. The deterministic
    identical-path claim therefore covers the pre-chaotic steps (0..3,
    measured rel-diff <1.3% for both families), plus that both learn."""
    sys.path.insert(0, ".")
    from scripts.parity_dense_training import run_trajectories

    res = run_trajectories(kind, n_steps=60, batch=4, t=T, lr=1e-3, seed=0)
    ours, theirs = np.array(res["ours_loss"]), np.array(res["ref_loss"])
    assert ours[-15:].mean() < ours[:5].mean(), "ours did not learn"
    assert theirs[-15:].mean() < theirs[:5].mean(), "reference did not learn"
    # The torch reference's own run-to-run noise grows ~30x per optimizer
    # step (measured across full-suite reruns: step0 ~3e-6, step1 ~4e-4,
    # step2 0.08%..1.1%, step3 0.4%..3%), so only steps 0 and 1 carry a
    # deterministic cross-framework claim: identical loss on identical
    # weights, then still-matching loss after ONE identical Adam update.
    rel = np.abs(ours[:2] - theirs[:2]) / np.abs(theirs[:2])
    assert rel[0] < 1e-3 and rel[1] < 1e-2, (ours[:2], theirs[:2])


@pytest.mark.slow
def test_training_trajectory_parity_svg():
    sys.path.insert(0, ".")
    from scripts.parity_dense_training import run_trajectories

    res = run_trajectories("svg", n_steps=60, batch=2, t=3, lr=1e-3, seed=0)
    ours, theirs = np.array(res["ours_loss"]), np.array(res["ref_loss"])
    assert ours[-10:].mean() < ours[:10].mean(), "ours did not learn"
    assert theirs[-10:].mean() < theirs[:10].mean(), "reference did not learn"
    a, b_ = ours[-15:].mean(), theirs[-15:].mean()
    assert abs(a - b_) / abs(b_) < 0.08, (a, b_)
