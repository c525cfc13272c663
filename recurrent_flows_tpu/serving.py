"""Serving path: load a checkpoint, get compiled low-latency inference fns.

Production-deployment counterpart to the training harness: a ``Predictor``
wraps a trained checkpoint with pre-jitted, fixed-shape programs for
autoregressive rollout / reconstruction / free-running sampling, with an
explicit ``warmup()`` so the first request never pays compilation.

    pred = Predictor.from_checkpoint("runs/rfn/model_folder/last",
                                     n_conditions=5, n_predictions=10)
    pred.warmup(batch_size=8)
    frames = pred.predict(context_frames)  # [B, n_pred, H, W, C] in [0,1]
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .training.trainer import preprocess


class Predictor:
    """Fixed-shape compiled inference over a trained model."""

    def __init__(self, model, variables, tcfg, n_conditions: int = 5,
                 n_predictions: int = 10, temperature: Optional[float] = None,
                 seed: int = 0):
        if temperature is not None and hasattr(model.cfg, "temperature"):
            cfg = dataclasses.replace(model.cfg, temperature=temperature)
            model = type(model)(cfg, remat=False)
        self.model = model
        self.variables = variables
        self.tcfg = tcfg
        self.n_conditions = n_conditions
        self.n_predictions = n_predictions
        self._key = jax.random.key(seed)

        def _predict(v, x, key):
            _, preds = model.apply(v, x, n_predictions, n_conditions, key,
                                   method="predict")
            return preds.swapaxes(0, 1)  # [B, n_pred, ...]

        def _reconstruct(v, x, key):
            out = model.apply(v, x, key, method="reconstruct")
            out = out[0] if isinstance(out, tuple) else out
            return out.swapaxes(0, 1)

        def _sample(v, x, key, n):
            return model.apply(v, x, n, key, method="sample").swapaxes(0, 1)

        self._predict = jax.jit(_predict)
        self._reconstruct = jax.jit(_reconstruct)
        self._sample = jax.jit(_sample, static_argnums=(3,))

    @classmethod
    def from_checkpoint(cls, ckpt_dir: str, **kw) -> "Predictor":
        from .cli.eval_settings import load_model_from_checkpoint

        model, variables, tcfg, _ = load_model_from_checkpoint(ckpt_dir)
        return cls(model, variables, tcfg, **kw)

    # -- data-space conversion ------------------------------------------------

    def _to_model_space(self, frames):
        t = self.tcfg
        return preprocess(jnp.asarray(frames, jnp.float32), t.n_bits,
                          t.preprocess_range, t.preprocess_scale)

    def _to_image_space(self, x):
        t = self.tcfg
        if t.preprocess_range == "0.5":
            return np.asarray(jnp.clip(x + 0.5, 0.0, 1.0))
        if t.preprocess_range == "minmax":
            return np.asarray(jnp.clip((x + 1.0) * 0.5, 0.0, 1.0))
        return np.asarray(jnp.clip(x, 0.0, 1.0))

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # -- public API ---------------------------------------------------------

    def warmup(self, batch_size: int, image_size: Optional[int] = None,
               channels: Optional[int] = None):
        """Compile all programs for the serving shape."""
        img = image_size or getattr(self.model.cfg, "image_size", 64)
        c = channels or getattr(self.model.cfg, "x_channels", 1)
        dummy = np.zeros((batch_size, self.n_conditions, img, img, c), np.float32)
        self.predict(dummy)
        return self

    def predict(self, context_frames) -> np.ndarray:
        """context [B, >=n_conditions, H, W, C] in [0,1] -> future frames."""
        x = self._to_model_space(context_frames[:, : self.n_conditions])
        preds = self._predict(self.variables, x, self._next_key())
        return self._to_image_space(preds)

    def reconstruct(self, frames) -> np.ndarray:
        x = self._to_model_space(frames)
        return self._to_image_space(self._reconstruct(self.variables, x, self._next_key()))

    def sample(self, seed_frame, n_frames: int) -> np.ndarray:
        """Free-run from a single frame: seed [B, H, W, C] in [0,1]."""
        x = self._to_model_space(seed_frame[:, None])
        return self._to_image_space(
            self._sample(self.variables, x, self._next_key(), n_frames)
        )

    # -- deployment export ----------------------------------------------------

    def export(self, path: Optional[str] = None, *, batch_size: int,
               image_size: Optional[int] = None,
               channels: Optional[int] = None,
               platforms: Optional[tuple] = None) -> bytes:
        """Serialize the end-to-end predict program to a self-contained
        StableHLO artifact (``jax.export``): image-space preprocess ->
        autoregressive rollout -> postprocess, with the weights embedded
        as constants. The artifact is servable via :func:`load_exported`
        (or any StableHLO runtime) WITHOUT this package's model code or
        the checkpoint — the deployment story the reference (a research
        repo with pickled torch modules) has no counterpart for.

        Signature of the exported program:
        ``(context [B, n_cond, H, W, C] float32 in [0,1], seed int32)
        -> frames [B, n_pred, H, W, C] float32 in [0,1]``.

        ``platforms``: target platforms for lowering (e.g. ('tpu', 'cpu'))
        — defaults to the current backend only.
        """
        from jax import export as jax_export

        img = image_size or getattr(self.model.cfg, "image_size", 64)
        c = channels or getattr(self.model.cfg, "x_channels", 1)
        t = self.tcfg

        def serve(context, seed):
            x = preprocess(context, t.n_bits, t.preprocess_range,
                           t.preprocess_scale)
            preds = self._predict(self.variables, x, jax.random.key(seed))
            if t.preprocess_range == "0.5":
                preds = preds + 0.5
            elif t.preprocess_range == "minmax":
                preds = (preds + 1.0) * 0.5
            return jnp.clip(preds, 0.0, 1.0)

        x_spec = jax.ShapeDtypeStruct(
            (batch_size, self.n_conditions, img, img, c), jnp.float32)
        seed_spec = jax.ShapeDtypeStruct((), jnp.int32)
        kwargs = {}
        if platforms is not None:
            kwargs["platforms"] = tuple(platforms)
        exported = jax_export.export(jax.jit(serve), **kwargs)(
            x_spec, seed_spec)
        blob = exported.serialize()
        if path:
            with open(path, "wb") as f:
                f.write(blob)
        return blob


def load_exported(path_or_bytes):
    """Deserialize a :meth:`Predictor.export` artifact into a jitted
    callable ``(context, seed) -> frames`` — no model code, config, or
    checkpoint needed."""
    from jax import export as jax_export

    blob = path_or_bytes
    if isinstance(path_or_bytes, str):
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    exported = jax_export.deserialize(bytearray(blob))
    return jax.jit(exported.call)
