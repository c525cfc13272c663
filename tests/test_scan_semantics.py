"""Temporal-causality invariants of the ConvLSTM scans.

The forward h-scan must be causal (output at t depends only on inputs
<= t); the reverse smoothing scan must be anti-causal (output at t depends
only on inputs >= t) — the property the reference implements with its
backward python loop (RFN/RFN_new.py:142-153).
"""

import jax
import jax.numpy as jnp
import numpy as np

from recurrent_flows_tpu.nn.convlstm import ConvLSTMCell, conv_lstm_scan

T, B, H, W, CIN, HC = 6, 2, 4, 4, 3, 5


def _setup():
    cell = ConvLSTMCell(HC)
    xs = jax.random.normal(jax.random.key(0), (T, B, H, W, CIN))
    h0 = jnp.zeros((B, H, W, HC))
    v = cell.init(jax.random.key(1), xs[0], h0, h0)
    v = jax.tree.map(lambda a: a + 0.05, v)
    apply = lambda x, h, c: cell.apply(v, x, h, c)
    return apply, xs, h0


def test_forward_scan_is_causal():
    apply, xs, h0 = _setup()
    hs, _, _ = conv_lstm_scan(apply, xs, h0, h0)
    j = 3
    xs2 = xs.at[j].add(10.0)  # perturb a middle step
    hs2, _, _ = conv_lstm_scan(apply, xs2, h0, h0)
    np.testing.assert_allclose(np.asarray(hs[:j]), np.asarray(hs2[:j]), atol=1e-6)
    assert float(jnp.abs(hs[j:] - hs2[j:]).max()) > 1e-3


def test_reverse_scan_is_anticausal():
    apply, xs, h0 = _setup()
    hs, _, _ = conv_lstm_scan(apply, xs, h0, h0, reverse=True)
    j = 3
    xs2 = xs.at[j].add(10.0)
    hs2, _, _ = conv_lstm_scan(apply, xs2, h0, h0, reverse=True)
    # outputs strictly after j (processed before j in reverse) unchanged
    np.testing.assert_allclose(np.asarray(hs[j + 1:]), np.asarray(hs2[j + 1:]),
                               atol=1e-6)
    assert float(jnp.abs(hs[: j + 1] - hs2[: j + 1]).max()) > 1e-3
