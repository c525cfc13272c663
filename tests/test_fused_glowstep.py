"""Fused Pallas GlowStep kernel vs the module path (VERDICT r1 item #4).

On CPU the kernel runs in interpreter mode; the same tests run on real TPU
hardware (scripts/bench_glowstep.py drives the compiled kernel there).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recurrent_flows_tpu.config import GlowConfig
from recurrent_flows_tpu.flows.glow import GlowStep

B, H, C, CC, U = 4, 4, 8, 6, 16


def _pair(clamp_type="realnvp"):
    cfg_ref = GlowConfig(L=1, K=1, n_units_affine=U, clamp_type=clamp_type,
                         coupling_impl="conv")
    cfg_fused = GlowConfig(L=1, K=1, n_units_affine=U, clamp_type=clamp_type,
                           coupling_impl="fused")
    sref = GlowStep(C, cfg_ref)
    sfused = GlowStep(C, cfg_fused)
    x = jax.random.normal(jax.random.key(0), (B, H, H, C))
    cond = jax.random.normal(jax.random.key(1), (B, H, H, CC))
    v = sref.init(jax.random.key(2), x, cond)
    # make actnorms/zero-convs non-trivial
    v = {"params": jax.tree.map(lambda a: a + 0.05, v["params"]),
         "consts": v["consts"]}
    return sref, sfused, v, x, cond


@pytest.mark.fast
@pytest.mark.parametrize("clamp", ["realnvp", "glow", "softclamp", "none"])
def test_fused_matches_module_forward(clamp):
    sref, sfused, v, x, cond = _pair(clamp)
    za, la = sref.apply(v, x, cond, jnp.zeros(B))
    zb, lb = sfused.apply(v, x, cond, jnp.zeros(B))
    # 'none' leaves log_scale unclamped -> exp amplifies f32 sum-order noise
    atol = 1e-4 if clamp == "none" else 1e-5
    np.testing.assert_allclose(np.asarray(zb), np.asarray(za),
                               rtol=1e-5, atol=atol)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.fast
def test_fused_matches_module_inverse_and_roundtrip():
    sref, sfused, v, x, cond = _pair()
    z, ld = sfused.apply(v, x, cond, jnp.zeros(B))
    xa, lda = sref.apply(v, z, cond, ld, reverse=True)
    xb, ldb = sfused.apply(v, z, cond, ld, reverse=True)
    np.testing.assert_allclose(np.asarray(xb), np.asarray(xa),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldb), np.asarray(lda),
                               rtol=1e-5, atol=1e-4)
    # fused round-trip reproduces x and returns logdet to ~0
    np.testing.assert_allclose(np.asarray(xb), np.asarray(x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ldb), 0.0, atol=1e-3)


@pytest.mark.fast
def test_fused_gradients_match_module():
    sref, sfused, v, x, cond = _pair()

    def loss(mod):
        def f(params, x):
            z, ld = mod.apply({"params": params, "consts": v["consts"]},
                              x, cond, jnp.zeros(B))
            return jnp.sum(z ** 2) - jnp.sum(ld)

        return f

    ga = jax.grad(loss(sref), argnums=(0, 1))(v["params"], x)
    gb = jax.grad(loss(sfused), argnums=(0, 1))(v["params"], x)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.fast
def test_auto_impl_uses_conv_off_tpu():
    """coupling_impl='auto' (the default) must not engage interpret-mode
    pallas on CPU — it resolves to the plain conv path and matches it."""
    cfg_auto = GlowConfig(L=1, K=1, n_units_affine=U, coupling_impl="auto")
    cfg_conv = GlowConfig(L=1, K=1, n_units_affine=U, coupling_impl="conv")
    sa, sc = GlowStep(C, cfg_auto), GlowStep(C, cfg_conv)
    x = jax.random.normal(jax.random.key(0), (B, 2, 2, C))
    cond = jax.random.normal(jax.random.key(1), (B, 2, 2, CC))
    v = sc.init(jax.random.key(2), x, cond)
    za, la = sa.apply(v, x, cond, jnp.zeros(B))
    zc, lc = sc.apply(v, x, cond, jnp.zeros(B))
    np.testing.assert_array_equal(np.asarray(za), np.asarray(zc))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lc))


@pytest.mark.fast
def test_fused_falls_back_on_large_spatial():
    """H*W > 256 -> the conv path runs (no kernel); results still match."""
    cfg = GlowConfig(L=1, K=1, n_units_affine=U, coupling_impl="fused")
    s = GlowStep(C, cfg)
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, C))
    cond = jax.random.normal(jax.random.key(1), (2, 32, 32, CC))
    v = s.init(jax.random.key(2), x, cond)
    z, ld = s.apply(v, x, cond, jnp.zeros(2))
    assert np.isfinite(np.asarray(z)).all() and np.isfinite(np.asarray(ld)).all()


@pytest.mark.fast
def test_glowchain_multi_tile_matches_jnp_chain():
    """glowchain kernel with a multi-tile batch grid (b > batch tile,
    b not a tile multiple -> zero-pad + slice-back) and streamed [K,...]
    params == the jnp reference chain, both directions. Covers the
    carry-init-per-batch-tile logic the single-tile ListGlow tests miss."""
    from recurrent_flows_tpu.ops.pallas.glowchain import (
        glowchain_fused,
        glowchain_jnp,
    )
    from recurrent_flows_tpu.ops.pallas.glowstep import (
        GlowStepParams,
        _pick_batch_tile,
    )

    b, h, c, cc, u, k = 12, 16, 4, 3, 8, 3
    assert _pick_batch_tile(b, h, h) < b  # the point: multiple batch tiles
    ks = iter(jax.random.split(jax.random.key(0), 16))

    def n(shape, scale=0.1):
        return jax.random.normal(next(ks), shape, jnp.float32) * scale

    half, ca = c // 2, c // 2 + cc
    ps = GlowStepParams(
        an_bias=n((k, c)), an_logs=n((k, c)),
        w1x1=jnp.tile(jnp.eye(c)[None], (k, 1, 1)) + n((k, c, c)),
        wa=n((k, 9, ca, u)), ana_bias=n((k, u)), ana_logs=n((k, u)),
        wb=n((k, u, u)), anb_bias=n((k, u)), anb_logs=n((k, u)),
        wc=n((k, 9, u, c)), bias_c=n((k, c)),
        clamp_scale=jnp.ones((k, half)), clamp_shift=jnp.zeros((k, half)),
    )
    x = jax.random.normal(next(ks), (b, h, h, c))
    cond = jax.random.normal(next(ks), (b, h, h, cc))
    for reverse in (False, True):
        y_k, ld_k = glowchain_fused(x, cond, ps, "realnvp", reverse)
        y_j, ld_j = glowchain_jnp(x, cond, ps, clamp_type="realnvp",
                                  reverse=reverse)
        np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_j),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ld_k), np.asarray(ld_j[:, 0]),
                                   rtol=1e-5, atol=1e-4)
