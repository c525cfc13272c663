"""No module may run device ops at import time.

Round-1 regression: a module-level ``jnp.log(127.5)`` in ops/mol.py
initialized the TPU backend when the driver imported __graft_entry__, and
died on a libtpu mismatch before dryrun_multichip could force the CPU
platform (VERDICT.md Missing #1). This test imports the whole package plus
__graft_entry__ in a clean subprocess and asserts the JAX backend was never
initialized.
"""

import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

_CHECK = r"""
import importlib, pkgutil, sys

import jax

import recurrent_flows_tpu

for mod in pkgutil.walk_packages(recurrent_flows_tpu.__path__, "recurrent_flows_tpu."):
    importlib.import_module(mod.name)
import __graft_entry__  # noqa: F401

assert not jax._src.xla_bridge._backends, (
    "JAX backend initialized at import time by one of the modules: "
    f"{sorted(jax._src.xla_bridge._backends)}"
)
print("import-pure")
"""


@pytest.mark.fast
def test_imports_do_not_initialize_backend():
    out = subprocess.run(
        [sys.executable, "-c", _CHECK],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    assert "import-pure" in out.stdout
