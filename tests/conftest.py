"""Test config: force CPU with 8 virtual devices (multi-chip sharding tests).

Must run before jax is imported anywhere.
"""

import os

# Force-assign: the environment's sitecustomize pins JAX_PLATFORMS=axon (TPU
# tunnel); tests must run on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
# Tests get their OWN persistent-compile-cache dir: sharing ~/.cache with
# concurrently running TPU benchmark processes produced a native crash in
# jax's cache serializer (segfault in put_executable_and_time under
# concurrent writes). CPU test compiles are cheap; isolation > reuse.
os.environ.setdefault("RFT_COMPILATION_CACHE", "/tmp/rft_test_xla_cache")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")


# ---------------------------------------------------------------------------
# Tiering: `-m fast` = a <5 min smoke tier (numerics oracles, import purity,
# data plumbing). Individual tests elsewhere may also carry @pytest.mark.fast.
# Heavy training/parity tests carry @pytest.mark.slow explicitly.
# ---------------------------------------------------------------------------

import os.path as _osp

_FAST_FILES = {
    "test_oracle_flows.py",
    "test_oracle_nn.py",
    "test_oracle_listglow.py",
    "test_scan_semantics.py",
    "test_import_purity.py",
    "test_pallas_ops.py",
    "test_file_datasets.py",
    "test_distributed.py",
    "test_mol.py",
    "test_digit_banks.py",
    "test_schedules.py",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        # 'slow' opts an individual test OUT of the fast smoke tier even
        # when its file is fast-marked (keeps `-m fast` a <5 min signal)
        if item.get_closest_marker("slow") is not None:
            continue
        if _osp.basename(str(item.fspath)) in _FAST_FILES:
            item.add_marker(_pytest.mark.fast)
_FAST_FILES.add("test_embedders.py")
_FAST_FILES.add("test_celeba_path.py")
_FAST_FILES.add("test_fused_glowstep.py")
