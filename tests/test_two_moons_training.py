"""End-to-end learning check: RealNVP on two-moons (BASELINE config 1).

Short CPU training must substantially improve the NLL and produce samples
concentrated near the data manifold.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from recurrent_flows_tpu.data import two_moons
from recurrent_flows_tpu.flows.realnvp2d import RealNVP2D


def test_realnvp_learns_two_moons():
    model = RealNVP2D(n_couplings=6, hidden=32)
    x0 = two_moons(jax.random.key(0), 256)
    params = model.init(jax.random.key(1), x0)
    opt = optax.adam(2e-3)
    ost = opt.init(params)

    @jax.jit
    def step(params, ost, key):
        x = two_moons(key, 256)

        def loss(p):
            return -jnp.mean(model.apply(p, x))

        l, g = jax.value_and_grad(loss)(params)
        u, ost = opt.update(g, ost)
        return optax.apply_updates(params, u), ost, l

    losses = []
    for i in range(400):
        params, ost, l = step(params, ost, jax.random.key(10 + i))
        losses.append(float(l))
    assert losses[-1] < losses[0] - 0.5, (losses[0], losses[-1])

    # samples should be near the moons: mean distance to the data set small
    samples = model.apply(params, jax.random.key(5), 512, method="sample")
    data = two_moons(jax.random.key(6), 2048)
    d = jnp.sqrt(
        jnp.min(jnp.sum((samples[:, None] - data[None]) ** 2, -1), axis=1)
    )
    assert float(jnp.mean(d)) < 0.25, float(jnp.mean(d))
