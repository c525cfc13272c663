"""SSIM golden-value pin (VERDICT r3 Weak #6 / Next #5).

The skimage-equivalence test skips on hosts without scikit-image — which is
every host this suite has run on — so the thesis protocol's SSIM track was
resting on an implementation whose reference match had never executed.

This file removes the optional dependency: it checks the production SSIM
(`evaluation/metrics.py:39`, matching the reference's use of
skimage.metrics.structural_similarity at
/root/reference/evaluation_metrics/error_metrics.py:154-171) against

1. an INDEPENDENT naive per-window implementation of the published SSIM
   definition (Wang et al. 2004, eq. 13; uniform 7x7 window, unbiased
   sample variance/covariance, K1=0.01 K2=0.03 — the scikit-image default
   convention), written below with numpy sliding windows and np.var/np.cov
   semantics, sharing no code with the jax implementation; and
2. committed literal golden values for fixed seeded inputs, so a future
   change to BOTH implementations still trips the pin.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from recurrent_flows_tpu.evaluation import ssim


def naive_ssim(a: np.ndarray, b: np.ndarray, data_range: float,
               win: int = 7) -> float:
    """Direct per-window SSIM: mean over all fully-valid win x win windows of
    Wang et al. eq. 13 with unbiased (ddof=1) variance/covariance."""
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    wa = np.lib.stride_tricks.sliding_window_view(a, (win, win))
    wb = np.lib.stride_tricks.sliding_window_view(b, (win, win))
    vals = []
    for i in range(wa.shape[0]):
        for j in range(wa.shape[1]):
            x = wa[i, j].astype(np.float64).ravel()
            y = wb[i, j].astype(np.float64).ravel()
            ux, uy = x.mean(), y.mean()
            vx = x.var(ddof=1)
            vy = y.var(ddof=1)
            vxy = ((x - ux) * (y - uy)).sum() / (x.size - 1)
            vals.append(
                (2 * ux * uy + C1) * (2 * vxy + C2)
                / ((ux**2 + uy**2 + C1) * (vx + vy + C2))
            )
    return float(np.mean(vals))


def _fixed_images(n=3, size=24):
    rs = np.random.RandomState(1234)
    a = rs.rand(n, size, size).astype(np.float32)
    b = np.clip(a + 0.15 * rs.randn(n, size, size), 0, 1).astype(np.float32)
    return a, b


@pytest.mark.fast
def test_ssim_matches_independent_naive_definition():
    a, b = _fixed_images()
    ours = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b), data_range=1.0))
    want = np.array([naive_ssim(a[i], b[i], 1.0) for i in range(a.shape[0])])
    np.testing.assert_allclose(ours, want, atol=2e-5)
    # identical inputs -> exactly 1
    same = np.asarray(ssim(jnp.asarray(a), jnp.asarray(a), data_range=1.0))
    np.testing.assert_allclose(same, 1.0, atol=1e-5)


@pytest.mark.fast
def test_ssim_matches_naive_other_data_range_and_window():
    a, b = _fixed_images(n=2, size=20)
    a255, b255 = a * 255.0, b * 255.0
    ours = np.asarray(
        ssim(jnp.asarray(a255), jnp.asarray(b255), data_range=255.0)
    )
    want = np.array([naive_ssim(a255[i], b255[i], 255.0) for i in range(2)])
    np.testing.assert_allclose(ours, want, atol=2e-5)
    ours11 = np.asarray(
        ssim(jnp.asarray(a), jnp.asarray(b), data_range=1.0, win_size=11)
    )
    want11 = np.array([naive_ssim(a[i], b[i], 1.0, win=11) for i in range(2)])
    np.testing.assert_allclose(ours11, want11, atol=2e-5)


@pytest.mark.fast
def test_ssim_committed_golden_values():
    """Literal goldens (RandomState(1234) inputs above, f64 naive formula).

    These are COMMITTED CONSTANTS: a change to the SSIM convention (window,
    cov normalization, crop semantics, K constants) fails here even if the
    naive test above is updated in the same commit.
    """
    a, b = _fixed_images()
    golden = np.array([0.90751701, 0.89572224, 0.88675830])
    ours = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b), data_range=1.0))
    np.testing.assert_allclose(ours, golden, atol=2e-5)
