"""recurrent_flows_tpu — TPU-native stochastic video prediction with normalizing flows.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
cdglissov/recurrent-flows-msc (PyTorch): RFN (recurrent flow network =
temporal latent prior + conditional Glow decoder), SRNN, VRNN, SVG over
SM-MNIST / KTH / BAIR, plus a standalone conditional flow library, data
generators and an evaluation suite.

Design stance (TPU-first, not a port):
  * NHWC layouts everywhere (TPU native), bfloat16-friendly.
  * Pure functions + pytrees (flax.linen), explicit PRNG keys.
  * Time loops are ``lax.scan``; per-frame feature extraction is batched
    over B*T so the MXU sees large matmuls instead of T python steps.
  * ActNorm data-dependent init is an explicit one-pass DDI mode rather
    than in-place buffer mutation (reference: Flow/glow_modules.py:22-36).
  * Multi-device scaling via jax.sharding.Mesh + NamedSharding (SPMD data
    parallel; spatial sharding optional) instead of nn.DataParallel.
"""

__version__ = "0.1.0"
