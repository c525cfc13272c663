"""Linear autoregressive pixel baseline (the reference's "averagemodel").

Reference averagemodel/averagemodel.py:56-199: a linear regression over the
conditioning frames and all pairwise lagged differences predicting the next
frame, trained briefly, reporting SSIM/PSNR per rollout step. Here the
model is a closed jittable linear map trained with a few Adam steps.
"""

from __future__ import annotations

import itertools
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .metrics import eval_seq


def _features(cond):
    """[B, n_cond, H, W, C] -> stacked frames + pairwise diffs [B, F, H, W, C]."""
    n = cond.shape[1]
    diffs = [cond[:, i] - cond[:, j] for i, j in itertools.combinations(range(n), 2)]
    feats = [cond[:, i] for i in range(n)] + diffs
    return jnp.stack(feats, axis=1)


class SimpleLinearModel:
    """Next-frame = weighted sum of features + bias, rolled out autoregressively."""

    def __init__(self, n_conditions: int = 5):
        self.n_conditions = n_conditions
        n_feat = n_conditions + n_conditions * (n_conditions - 1) // 2
        self.w = jnp.zeros((n_feat,)).at[n_conditions - 1].set(1.0)  # copy-last init
        self.b = jnp.zeros(())

    def predict_next(self, params, cond):
        w, b = params
        f = _features(cond)
        return jnp.einsum("f,bfhwc->bhwc", w, f) + b

    def rollout(self, params, cond, n_predictions: int):
        preds = []
        window = cond
        for _ in range(n_predictions):
            nxt = jnp.clip(self.predict_next(params, window), 0.0, 1.0)
            preds.append(nxt)
            window = jnp.concatenate([window[:, 1:], nxt[:, None]], axis=1)
        return jnp.stack(preds, axis=1)

    def fit(self, data, key, steps: int = 200, batch_size: int = 16,
            seq_len: int = 10, lr: float = 1e-2):
        params = (self.w, self.b)
        opt = optax.adam(lr)
        ost = opt.init(params)
        nc = self.n_conditions

        @jax.jit
        def step(params, ost, x):
            def loss(p):
                pred = self.predict_next(p, x[:, :nc])
                return jnp.mean(jnp.square(pred - x[:, nc]))

            l, g = jax.value_and_grad(loss)(params)
            u, ost2 = opt.update(g, ost)
            return optax.apply_updates(params, u), ost2, l

        for i in range(steps):
            x = data.sample(jax.random.fold_in(key, i), batch_size)
            params, ost, l = step(params, ost, x)
        self.w, self.b = params
        return float(l)

    def evaluate(self, data, key, n_predictions: int = 10, batch_size: int = 16):
        """Per-step SSIM/PSNR of the linear rollout (reference :159-199)."""
        x = data.sample(key, batch_size)
        nc = self.n_conditions
        preds = self.rollout((self.w, self.b), x[:, :nc], n_predictions)
        true = x[:, nc : nc + n_predictions]
        res = eval_seq(true, preds)
        return {k: np.asarray(v).mean(0) for k, v in res.items()}
