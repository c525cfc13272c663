"""Persistent XLA compilation cache (big QoL on TPU: the production config
compiles ~6 min; with the cache that cost is paid once per machine).

Call :func:`enable` early (CLI mains, Trainer.build and bench do). Override
the location with RFT_COMPILATION_CACHE; disable with RFT_COMPILATION_CACHE=0.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/recurrent_flows_tpu/xla")
_enabled = False


def _host_fingerprint() -> str:
    """Key the cache by host CPU features.

    XLA:CPU persists AOT executables specialized to the compiling
    machine's ISA extensions; loading them on a host with different
    features is undefined ("could lead to execution errors such as
    SIGILL" per cpu_aot_loader) — observed as a hard abort inside
    compilation_cache.get_executable_and_time when this VM migrated to
    a different CPU generation. Partitioning the directory by a
    cpuinfo-flags hash makes a host change a cache MISS instead of a
    crash. (TPU executables re-key too on host moves — one ~6 min
    recompile, then warm again.)
    """
    import hashlib
    import platform

    src = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    src += line
                    break
    except OSError:  # pragma: no cover - non-procfs platforms
        pass
    return hashlib.sha1(src.encode()).hexdigest()[:12]


def enable(path: str | None = None) -> bool:
    global _enabled
    if _enabled:
        return True
    env = os.environ.get("RFT_COMPILATION_CACHE")
    if env == "0":
        return False
    path = path or env or _DEFAULT
    path = os.path.join(path, _host_fingerprint())
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        _enabled = True
        return True
    except Exception:  # pragma: no cover - older jax or readonly fs
        return False
