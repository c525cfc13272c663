"""MoL likelihood: golden tests vs the torch reference + sanity checks."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recurrent_flows_tpu.ops import (
    mol_log_prob_1d,
    mol_log_prob_rgb,
    mol_sample_1d,
    mol_sample_rgb,
)

B, H, W, NMIX = 2, 6, 6, 3


def test_mol_rgb_matches_reference():
    torch = pytest.importorskip("torch")
    torch.Tensor.cuda = lambda self, *a, **k: self
    sys.path.insert(0, "/root/reference")
    from Utils import discretize_logits as ref

    x = np.random.RandomState(0).uniform(-1, 1, (B, H, W, 3)).astype(np.float32)
    # quantize to the 8-bit grid like real data
    x = np.round((x + 1) * 127.5) / 127.5 - 1.0
    l = np.random.RandomState(1).normal(0, 1, (B, H, W, 10 * NMIX)).astype(np.float32)
    ours = mol_log_prob_rgb(jnp.asarray(x), jnp.asarray(l))
    theirs = -ref.discretized_mix_logistic_loss(
        torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(l.transpose(0, 3, 1, 2))
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-4)


def test_mol_1d_matches_reference():
    torch = pytest.importorskip("torch")
    torch.Tensor.cuda = lambda self, *a, **k: self
    # the reference's 1d loss hard-codes .cuda(); patch zeros too
    sys.path.insert(0, "/root/reference")
    from Utils import discretize_logits as ref

    x = np.random.RandomState(0).uniform(-1, 1, (B, H, W, 1)).astype(np.float32)
    x = np.round((x + 1) * 127.5) / 127.5 - 1.0
    l = np.random.RandomState(1).normal(0, 1, (B, H, W, 3 * NMIX)).astype(np.float32)
    ours = mol_log_prob_1d(jnp.asarray(x), jnp.asarray(l))
    theirs = -ref.discretized_mix_logistic_loss_1d(
        torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(l.transpose(0, 3, 1, 2))
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-4)


def test_mol_log_prob_sums_to_one_1d():
    """Sum of bin probabilities over the 8-bit grid ~ 1 (proper pmf)."""
    l = jax.random.normal(jax.random.key(0), (1, 1, 1, 3 * NMIX))
    grid = (jnp.arange(256.0) / 127.5) - 1.0
    xs = grid.reshape(256, 1, 1, 1)
    lps = jax.vmap(lambda g: mol_log_prob_1d(g[None], l)[0])(xs)
    total = jnp.sum(jnp.exp(lps))
    np.testing.assert_allclose(float(total), 1.0, atol=1e-3)


def test_mol_samples_in_range():
    key = jax.random.key(0)
    l3 = jax.random.normal(key, (B, H, W, 10 * NMIX))
    s3 = mol_sample_rgb(key, l3)
    assert s3.shape == (B, H, W, 3)
    assert float(jnp.max(jnp.abs(s3))) <= 1.0
    l1 = jax.random.normal(key, (B, H, W, 3 * NMIX))
    s1 = mol_sample_1d(key, l1)
    assert s1.shape == (B, H, W, 1)
    assert float(jnp.max(jnp.abs(s1))) <= 1.0
    # sharp mixture -> samples concentrate near the selected mean
    l_sharp = jnp.zeros((B, H, W, 3 * NMIX))
    l_sharp = l_sharp.at[..., NMIX : 2 * NMIX].set(0.5)  # means = 0.5
    l_sharp = l_sharp.at[..., 2 * NMIX :].set(-7.0)  # tiny scales
    s = mol_sample_1d(jax.random.key(1), l_sharp)
    np.testing.assert_allclose(np.asarray(s), 0.5, atol=0.02)
