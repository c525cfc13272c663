"""K GlowSteps of one flow scale in ONE pallas_call (VMEM-resident chain).

The production flow's deep scales (8x8/4x4/2x2, C=16..64 at B=30) execute
hundreds of serialized tiny XLA kernels per K=10 GlowStep chain — the
per-scale K-stack microbench (scripts/bench_glowstep.py, docs/PERF.md)
bottoms out at ~1.8 ms per deep scale regardless of data size, i.e. a
~2.4 us/kernel launch floor, not compute. The per-step fused kernel
(ops/pallas/glowstep.py) still pays two dispatches per step; this kernel
removes ALL intra-scale boundaries:

  grid = (batch_tiles, K)   # K iterates fastest -> sequential on TPU
  x is carried in the revisited output block (stays in VMEM across the K
  grid steps of a batch tile); per-step prepped weights are streamed from
  HBM via BlockSpec index maps (double-buffered by the pallas pipeline,
  ~3.5 MB/step at the deepest scale). The in-VMEM step math is
  glowstep_jnp — the same oracle-tested routine the per-step kernel uses.

Parameters arrive as a GlowStepParams whose every leaf is stacked to
[K, ...] in EXECUTION order (the caller reverses the stack for the
inverse direction), prepped by flows.glow.prep_glowstep_params.

Gradients: custom VJP that replays the chain with the jnp reference
(rematerialization) — exact, but only competitive where the forward win
dominates; the default gate (GlowConfig.chain_impl='sample') engages the
kernel on the no-grad sampling path only.

Reference math: Flow/glow.py:43-160 (the K-step scale chains of ListGlow).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .glowstep import GlowStepParams, _pick_batch_tile, glowstep_jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def glowchain_jnp(x, cond, ps: GlowStepParams, *, clamp_type: str,
                  reverse: bool):
    """jnp reference: K chained steps. ``ps`` leaves are [K, ...] in
    execution order. Returns (y, dyn_logdet[B,1]) — the summed coupling
    logdets; static actnorm/1x1 terms are added by the caller."""
    k_steps = ps.wa.shape[0]
    ld = jnp.zeros((x.shape[0], 1), jnp.float32)
    for k in range(k_steps):  # static unroll: traced once, K is small
        pk = jax.tree_util.tree_map(lambda a: a[k], ps)
        x, ldk = glowstep_jnp(x, cond, pk, clamp_type=clamp_type,
                              reverse=reverse)
        ld = ld + ldk
    return x, ld


def _kernel(x_ref, cond_ref, *rest, clamp_type, reverse, n_steps):
    *param_refs, out_ref, ld_ref = rest
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        # the out blocks are revisited for all K steps of a batch tile —
        # they live in VMEM until the batch-tile index changes, so they
        # double as the chain's carry
        out_ref[:] = x_ref[:]
        ld_ref[:] = jnp.zeros_like(ld_ref)

    p = GlowStepParams(*(r[0] for r in param_refs))
    y, ld = glowstep_jnp(out_ref[:], cond_ref[:], p, clamp_type=clamp_type,
                         reverse=reverse)
    out_ref[:] = y
    # lane dim must be 128: broadcast the per-sample logdet across lanes
    ld_ref[:] = ld_ref[:] + jnp.broadcast_to(ld, ld_ref.shape)


@functools.partial(jax.jit, static_argnames=("clamp_type", "reverse"))
def _glowchain_pallas(x, cond, ps: GlowStepParams, clamp_type: str,
                      reverse: bool):
    b, h, w, c = x.shape
    k_steps = ps.wa.shape[0]
    # Mosaic requires each block's last two dims to be (8,128)-divisible
    # or equal to the array's; stacked vectors [K, C] with block (1, C)
    # violate that on the K dim — lift them to [K, 1, C] so the block
    # (1, 1, C) trails with the full array dims. The extra unit dim
    # broadcasts transparently inside glowstep_jnp.
    ps = GlowStepParams(
        *(leaf[:, None, :] if leaf.ndim == 2 else leaf for leaf in ps)
    )
    bt = _pick_batch_tile(b, h, w)
    b_pad = -(-b // bt) * bt
    if b_pad != b:  # zero-pad batch to a tile multiple; sliced back below
        pad = ((0, b_pad - b), (0, 0), (0, 0), (0, 0))
        x = jnp.pad(x, pad)
        cond = jnp.pad(cond, pad)
    grid = (b_pad // bt, k_steps)

    def batch_spec(ch):
        return pl.BlockSpec((bt, h, w, ch), lambda i, k: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    # one step's weights per grid step, streamed (leading block dim 1)
    def param_spec(leaf):
        zeros = (0,) * (leaf.ndim - 1)
        return pl.BlockSpec((1,) + leaf.shape[1:],
                            lambda i, k, z=zeros: (k,) + z,
                            memory_space=pltpu.VMEM)

    param_specs = [param_spec(leaf) for leaf in ps]
    kern = functools.partial(_kernel, clamp_type=clamp_type, reverse=reverse,
                             n_steps=k_steps)

    out, ld = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[batch_spec(c), batch_spec(cond.shape[-1])] + param_specs,
        out_specs=(
            batch_spec(c),
            pl.BlockSpec((bt, 128), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 128), jnp.float32),
        ),
        # same scoped-VMEM budget as the per-step kernel: the unrolled
        # 3x3s keep up to 9 shifted U-wide slices live at U=256
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ) if _HAS_PALLAS and hasattr(pltpu, "CompilerParams") else None,
        # CPU (tests / virtual meshes): interpreter mode
        interpret=(jax.default_backend() != "tpu"),
    )(x, cond, *ps)
    return out[:b], ld[:b, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def glowchain_fused(x, cond, ps: GlowStepParams, clamp_type: str,
                    reverse: bool):
    """Whole-scale K-step chain: (y, dyn_logdet[B]). Pallas forward,
    jnp-remat VJP. ``ps`` leaves are [K, ...] in execution order."""
    return _glowchain_pallas(x, cond, ps, clamp_type, reverse)


def _chain_fwd(x, cond, ps, clamp_type, reverse):
    out = _glowchain_pallas(x, cond, ps, clamp_type, reverse)
    return out, (x, cond, ps)


def _chain_bwd(clamp_type, reverse, res, g):
    x, cond, ps = res

    def ref(x_, c_, p_):
        y, ld = glowchain_jnp(x_, c_, p_, clamp_type=clamp_type,
                              reverse=reverse)
        return y, ld[:, 0]

    _, vjp = jax.vjp(ref, x, cond, ps)
    return vjp(g)


glowchain_fused.defvjp(_chain_fwd, _chain_bwd)
