"""Peephole ConvLSTM (NHWC) with lax.scan time unrolls.

TPU-native equivalent of reference Utils/modules.py:326-414. The four gates
come from one fused conv over [x; h] (4*hidden output channels -> a single
large MXU matmul per step); the python-loop unroll of the reference becomes
``lax.scan`` (forward and reverse for the smoothing LSTM).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import conv2d


class ConvLSTMCell(nn.Module):
    """Single peephole ConvLSTM step.

    Gate order (i, f, o, g) and zero-init peephole weights Wci/Wcf/Wco of
    shape [1, H, W, hidden] match reference Utils/modules.py:355-393.
    """

    hidden_channels: int
    kernel: int = 3
    peephole: bool = True
    dtype: object = None  # compute dtype for the fused gate conv

    @nn.compact
    def __call__(self, x, h, c):
        hc = self.hidden_channels
        combined = jnp.concatenate([x, h], axis=-1)
        if self.dtype is not None:
            combined = combined.astype(self.dtype)
        gates = conv2d(
            4 * hc,
            self.kernel,
            kernel_init=nn.initializers.xavier_normal(),
            bias_init=nn.initializers.uniform(scale=1.0),
            name="gates",
            dtype=self.dtype,
        )(combined)
        gates = gates.astype(jnp.float32)  # gate nonlinearity + state in f32
        hw = (1, x.shape[1], x.shape[2], hc)
        if self.peephole:
            w_ci = self.param("Wci", nn.initializers.zeros, hw)
            w_cf = self.param("Wcf", nn.initializers.zeros, hw)
            w_co = self.param("Wco", nn.initializers.zeros, hw)
        else:
            w_ci = w_cf = w_co = jnp.zeros(hw, gates.dtype)
        from ..ops.pallas import convlstm_gates

        return convlstm_gates(gates, c, w_ci, w_cf, w_co)


def conv_lstm_scan(cell_apply, xs, h0, c0, reverse: bool = False):
    """Unroll a bound ConvLSTM cell over time-major input.

    Args:
      cell_apply: ``(x, h, c) -> (h, c)`` (a bound ConvLSTMCell or pytree fn).
      xs: time-major inputs, pytree with leading axis T.
      h0, c0: initial state [B, H, W, hidden].
      reverse: scan from the last step (smoothing a-LSTM).

    Returns: (hs [T, B, H, W, hidden], h_T, c_T).
    """

    def step(carry, x):
        h, c = carry
        h, c = cell_apply(x, h, c)
        return (h, c), h

    (h, c), hs = jax.lax.scan(step, (h0, c0), xs, reverse=reverse)
    return hs, h, c
