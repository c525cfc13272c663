"""Test config: force CPU with 8 virtual devices (multi-chip sharding tests).

Must run before jax is imported anywhere.
"""

import os

# Force-assign: the environment's sitecustomize pins JAX_PLATFORMS=axon (TPU
# tunnel); tests must run on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")
