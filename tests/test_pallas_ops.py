"""Pallas fused ops: interpret-mode kernels must match the jnp references,
and the custom VJPs must match autodiff through the reference math."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recurrent_flows_tpu.ops.pallas import fused


@pytest.fixture()
def force_pallas_interpret(monkeypatch):
    """Run the pallas paths in interpreter mode on CPU."""
    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setenv("RFT_PALLAS", "1")
    with pltpu.force_tpu_interpret_mode():
        yield


B, H, W, C = 2, 4, 4, 8


def test_coupling_transform_matches_jnp(force_pallas_interpret):
    z2 = jax.random.normal(jax.random.key(0), (B, H, W, C))
    shift = jax.random.normal(jax.random.key(1), z2.shape) * 0.1
    s = jax.random.normal(jax.random.key(2), z2.shape) * 0.1
    for reverse in (False, True):
        ref = fused._coupling_fwd_jnp(z2, shift, s, reverse)
        out = fused._coupling_pallas(z2, shift, s, reverse)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]), rtol=1e-5)


def test_coupling_transform_vjp():
    os.environ["RFT_PALLAS"] = "0"
    z2 = jax.random.normal(jax.random.key(0), (B, H, W, C))
    shift = jax.random.normal(jax.random.key(1), z2.shape) * 0.1
    s = jax.random.normal(jax.random.key(2), z2.shape) * 0.1

    def f_custom(z2, shift, s):
        out, ld = fused.coupling_transform(z2, shift, s, False)
        return jnp.sum(out ** 2) + jnp.sum(ld)

    def f_ref(z2, shift, s):
        out, ld = fused._coupling_fwd_jnp(z2, shift, s, False)
        return jnp.sum(out ** 2) + jnp.sum(ld)

    g1 = jax.grad(f_custom, argnums=(0, 1, 2))(z2, shift, s)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(z2, shift, s)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_actnorm_invconv_matches_jnp(force_pallas_interpret):
    x = jax.random.normal(jax.random.key(0), (B, H, W, C))
    bias = jax.random.normal(jax.random.key(1), (C,)) * 0.1
    logs = jax.random.normal(jax.random.key(2), (C,)) * 0.1
    w = jax.random.normal(jax.random.key(3), (C, C)) / np.sqrt(C)
    ref = fused._actnorm_invconv_jnp(x, bias, logs, w)
    out = fused._actnorm_invconv_pallas(x, bias, logs, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_actnorm_invconv_vjp():
    os.environ["RFT_PALLAS"] = "0"
    x = jax.random.normal(jax.random.key(0), (B, H, W, C))
    bias = jax.random.normal(jax.random.key(1), (C,)) * 0.1
    logs = jax.random.normal(jax.random.key(2), (C,)) * 0.1
    w = jax.random.normal(jax.random.key(3), (C, C)) / np.sqrt(C)
    f1 = lambda *a: jnp.sum(jnp.sin(fused.actnorm_invconv(*a)))
    f2 = lambda *a: jnp.sum(jnp.sin(fused._actnorm_invconv_jnp(*a)))
    g1 = jax.grad(f1, argnums=(0, 1, 2, 3))(x, bias, logs, w)
    g2 = jax.grad(f2, argnums=(0, 1, 2, 3))(x, bias, logs, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_convlstm_gates_matches_jnp(force_pallas_interpret):
    hc = C
    gates = jax.random.normal(jax.random.key(0), (B, H, W, 4 * hc))
    c = jax.random.normal(jax.random.key(1), (B, H, W, hc))
    peeps = [jax.random.normal(jax.random.key(2 + i), (1, H, W, hc)) * 0.1
             for i in range(3)]
    ref = fused._gates_jnp(gates, c, *peeps)
    out = fused._gates_pallas(gates, c, *peeps)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_convlstm_gates_vjp():
    os.environ["RFT_PALLAS"] = "0"
    hc = C
    gates = jax.random.normal(jax.random.key(0), (B, H, W, 4 * hc))
    c = jax.random.normal(jax.random.key(1), (B, H, W, hc))
    peeps = [jax.random.normal(jax.random.key(2 + i), (1, H, W, hc)) * 0.1
             for i in range(3)]
    f1 = lambda *a: sum(jnp.sum(o ** 2) for o in fused.convlstm_gates(*a))
    f2 = lambda *a: sum(jnp.sum(o ** 2) for o in fused._gates_jnp(*a))
    g1 = jax.grad(f1, argnums=tuple(range(5)))(gates, c, *peeps)
    g2 = jax.grad(f2, argnums=tuple(range(5)))(gates, c, *peeps)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
