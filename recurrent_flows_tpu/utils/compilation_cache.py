"""Persistent XLA compilation cache (big QoL on TPU: the production config
compiles ~6 min; with the cache that cost is paid once per machine).

Call :func:`enable` early (CLI mains, Trainer.build and bench do). Override
the location with RFT_COMPILATION_CACHE; disable with RFT_COMPILATION_CACHE=0.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/recurrent_flows_tpu/xla")
_enabled = False


def enable(path: str | None = None) -> bool:
    global _enabled
    if _enabled:
        return True
    env = os.environ.get("RFT_COMPILATION_CACHE")
    if env == "0":
        return False
    path = path or env or _DEFAULT
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        _enabled = True
        return True
    except Exception:  # pragma: no cover - older jax or readonly fs
        return False
