"""Two-moons flow playground (Notebooks/TwoMoonFlows.ipynb as a script).

Trains three flows on (rotating) two-moons and renders density/sample
figures:
  1. RealNVP (unconditional)
  2. Conditional RealNVP on the rotation angle
  3. Autoregressive mixture-CDF flow

Usage: python examples/two_moons.py [--steps 800] [--out runs/two_moons]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from recurrent_flows_tpu.data import RotatingTwoMoonsConditionalSampler, two_moons
from recurrent_flows_tpu.flows.realnvp2d import AutoregFlow2D, RealNVP2D


def train(model, sample_batch, steps, lr=2e-3, has_context=False, seed=0):
    x0 = sample_batch(jax.random.key(0))
    params = model.init(jax.random.key(1), *x0) if has_context else model.init(
        jax.random.key(1), x0
    )
    opt = optax.adam(lr)
    ost = opt.init(params)

    @jax.jit
    def step(params, ost, key):
        batch = sample_batch(key)

        def loss(p):
            lp = model.apply(p, *batch) if has_context else model.apply(p, batch)
            return -jnp.mean(lp)

        l, g = jax.value_and_grad(loss)(params)
        u, ost2 = opt.update(g, ost)
        return optax.apply_updates(params, u), ost2, l

    for i in range(steps):
        params, ost, l = step(params, ost, jax.random.key(10 + i))
        if i % 200 == 0:
            print(f"  step {i}: nll {float(l):.3f}")
    return params, float(l)


def density_grid(logprob_fn, extent=2.5, n=120):
    xs = np.linspace(-extent, extent, n)
    grid = np.stack(np.meshgrid(xs, xs), -1).reshape(-1, 2)
    lp = np.asarray(logprob_fn(jnp.asarray(grid, jnp.float32)))
    return np.exp(lp).reshape(n, n)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--out", default="runs/two_moons")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(13, 4))

    print("RealNVP…")
    nvp = RealNVP2D(n_couplings=6, hidden=64)
    params, _ = train(nvp, lambda k: two_moons(k, 512), args.steps)
    axes[0].imshow(density_grid(lambda g: nvp.apply(params, g)),
                   origin="lower", extent=[-2.5, 2.5, -2.5, 2.5], cmap="magma")
    s = np.asarray(nvp.apply(params, jax.random.key(2), 400, method="sample"))
    axes[0].scatter(s[:, 0], s[:, 1], s=2, c="cyan", alpha=0.4)
    axes[0].set_title("RealNVP")

    print("Conditional RealNVP…")
    sampler = RotatingTwoMoonsConditionalSampler()
    cnvp = RealNVP2D(n_couplings=6, hidden=64, context_dim=1)

    def cond_batch(k):
        k1, k2 = jax.random.split(k)
        theta = jax.random.uniform(k1, (), maxval=2 * jnp.pi)
        x = sampler.conditioned_sample(k2, 512, theta)
        return x, jnp.full((512, 1), theta)

    cparams, _ = train(cnvp, cond_batch, args.steps, has_context=True)
    theta0 = jnp.pi / 3
    ctx = jnp.full((120 * 120, 1), theta0)
    axes[1].imshow(
        density_grid(lambda g: cnvp.apply(cparams, g, ctx[: g.shape[0]])),
        origin="lower", extent=[-2.5, 2.5, -2.5, 2.5], cmap="magma",
    )
    axes[1].set_title(f"Conditional RealNVP (theta={float(theta0):.2f})")

    print("Autoregressive CDF flow…")
    ar = AutoregFlow2D(n_components=6, hidden=32)
    aparams, _ = train(ar, lambda k: two_moons(k, 512), args.steps)
    axes[2].imshow(density_grid(lambda g: ar.apply(aparams, g)),
                   origin="lower", extent=[-2.5, 2.5, -2.5, 2.5], cmap="magma")
    axes[2].set_title("Autoregressive mixture-CDF")

    fig.tight_layout()
    out = os.path.join(args.out, "two_moons.png")
    fig.savefig(out, dpi=120)
    print("wrote", out)


if __name__ == "__main__":
    main()
