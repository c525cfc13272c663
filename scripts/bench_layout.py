"""Measure TPU tile-padding cost on the flow's small-C tensors.

Theory (round 3c): the flow runs at ~280 GB/s of 900 because its x-stream
at the shallow scales is [B, H, W, C] with C in {4, 8, 16} — the TPU
physical layout tiles the last two dims to (8, 128), so C=4 pads the lane
dimension 32x. XLA cost analysis counts LOGICAL bytes; the hardware moves
PADDED bytes, which deflates the *achieved* bandwidth the roofline table
reports (docs/PERF.md round-3 decomposition).

This script times the same math in competing layouts with the validated
chained-dispatch value-fetch method (docs/PERF.md round-3 correction):

  A. elementwise chain (actnorm-like scale+bias+relu, depth D):
       [30,32,32,4] NHWC  vs  [30,32,128] packed (W,C fused)  vs
       [30,4,1024] channel-sublane  vs  [983040] flat
  B. K-chain of (invertible-1x1 matmul + per-channel affine):
       NHWC einsum  vs  packed block-diagonal 128x128 matmul
       (same math: W_bd = I_{32} (x) W, exactly the 1x1 applied per pixel)

If the packed variants win ~an order of magnitude at scale-0 shapes, the
padding theory is confirmed and a packed-layout flow path is worth
building; if they tie, the flow's deficit is elsewhere and this is parked
with data (like batch_flow / the fused kernel before it).

Usage: python scripts/bench_layout.py [--runs 30] [--depth 32]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from recurrent_flows_tpu.utils.compilation_cache import enable as _enable_cache


def _time(fn, args, runs):
    """Chained-dispatch value-fetch timing: each call consumes the previous
    call's scalar output on-device, the final scalar is fetched by value
    (block_until_ready is a no-op on this axon backend)."""
    chain = jnp.float32(0.0)
    chain = fn(chain, *args)  # compile + warmup
    float(chain)
    chain = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(runs):
        chain = fn(chain, *args)
    float(chain)
    return (time.perf_counter() - t0) / runs


def elementwise_variants(depth: int):
    """Same per-element math (x*s + b, relu), per layout.

    SLOPE timing: each layout is measured at depth D and 4D; per-layer
    cost = (t(4D) - t(D)) / 3D, cancelling the per-dispatch floor that
    dominates sub-ms microbenches on this tunnel backend."""

    def chain_body(x, s, b, depth):
        for _ in range(depth):
            x = jnp.maximum(x * s + b, 0.0) + 0.01  # +eps keeps relu live
        return jnp.sum(x)

    out = {}
    key = jax.random.key(0)
    base = jax.random.normal(key, (30, 32, 32, 4), jnp.float32)

    shapes = {
        "nhwc_c4": ((30, 32, 32, 4), (4,)),
        "packed_wc128": ((30, 32, 128), (128,)),
        "chan_sublane": ((30, 4, 1024), (4, 1)),
        "flat": ((30 * 32 * 32 * 4,), ()),
    }
    for name, (shape, sshape) in shapes.items():
        x = base.reshape(shape)
        s = jnp.full(sshape if sshape else (), 1.001, jnp.float32)
        b = jnp.zeros(sshape if sshape else (), jnp.float32)
        ts = {}
        for d in (depth, 4 * depth):
            @functools.partial(jax.jit, static_argnums=())
            def f(chain, x, s, b, _d=d):
                x = x + 0.0 * chain
                return chain_body(x, s, b, _d)

            ts[d] = _time(f, (x, s, b), RUNS)
        out[name] = (ts[4 * depth] - ts[depth]) / (3 * depth)
    return out


def invconv_variants(k_steps: int):
    """K-chain of (1x1 conv as matmul over C) + per-channel affine.

    NHWC: y[b,h,w,d] = sum_c x[b,h,w,c] W[c,d]; then y*s+b per channel.
    Packed: x [30,32,128] with (W=32 pixels x C=4) fused in lanes;
    the same math is y = x @ BD where BD = block_diag(W x32) (128x128),
    s/b tiled to 128 lanes. Bit-identical up to float reassociation.
    """
    key = jax.random.key(1)
    x_nhwc = jax.random.normal(key, (30, 32, 32, 4), jnp.float32)
    ws = [jnp.eye(4, dtype=jnp.float32) + 0.01 * jax.random.normal(jax.random.key(i), (4, 4))
          for i in range(k_steps)]
    ss = [jnp.full((4,), 1.001, jnp.float32) for _ in range(k_steps)]
    bs = [jnp.zeros((4,), jnp.float32) for _ in range(k_steps)]

    @jax.jit
    def f_nhwc(chain, x, ws, ss, bs):
        x = x + 0.0 * chain
        for w, s, b in zip(ws, ss, bs):
            x = jnp.einsum("bhwc,cd->bhwd", x, w)
            x = x * s + b
        return jnp.sum(x)

    # packed: lanes hold 32 pixels x 4 channels; 1x1 = block-diag matmul
    x_pk = x_nhwc.reshape(30, 32, 128)
    bds = [jax.scipy.linalg.block_diag(*([w] * 32)) for w in ws]
    ss_pk = [jnp.tile(s, 32) for s in ss]
    bs_pk = [jnp.tile(b, 32) for b in bs]

    @jax.jit
    def f_packed(chain, x, bds, ss, bs):
        x = x + 0.0 * chain
        for w, s, b in zip(bds, ss, bs):
            x = jnp.einsum("bhl,lm->bhm", x, w)
            x = x * s + b
        return jnp.sum(x)

    # sanity: identical math
    ref = f_nhwc(jnp.float32(0.0), x_nhwc, ws, ss, bs)
    got = f_packed(jnp.float32(0.0), x_pk, bds, ss_pk, bs_pk)
    assert abs(float(ref) - float(got)) / abs(float(ref)) < 1e-5, (ref, got)

    # channel-sublane layout [B, C, S]: 1x1 contracts over sublanes
    x_cs = x_nhwc.transpose(0, 3, 1, 2).reshape(30, 4, 1024)
    ss_cs = [s[:, None] for s in ss]
    bs_cs = [b[:, None] for b in bs]

    @jax.jit
    def f_cs(chain, x, ws, ss, bs):
        x = x + 0.0 * chain
        for w, s, b in zip(ws, ss, bs):
            x = jnp.einsum("bcs,cd->bds", x, w)
            x = x * s + b
        return jnp.sum(x)

    ref2 = f_cs(jnp.float32(0.0), x_cs, ws, ss_cs, bs_cs)
    assert abs(float(ref) - float(ref2)) / abs(float(ref)) < 1e-5, (ref, ref2)

    # slope over K (floor cancels): time at K and 3K by repeating params
    def slope(f, x, ws, ss, bs):
        t1 = _time(f, (x, ws, ss, bs), RUNS)
        t3 = _time(f, (x, ws * 3, ss * 3, bs * 3), RUNS)
        return (t3 - t1) / (2 * k_steps)

    return {
        "nhwc_einsum": slope(f_nhwc, x_nhwc, ws, ss, bs),
        "packed_blockdiag": slope(f_packed, x_pk, bds, ss_pk, bs_pk),
        "chan_sublane": slope(f_cs, x_cs, ws, ss_cs, bs_cs),
    }


def main():
    global RUNS
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=30)
    ap.add_argument("--depth", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    RUNS = args.runs
    _enable_cache()
    print(f"# devices: {jax.devices()}", flush=True)

    ew = elementwise_variants(args.depth)
    logical_gb = 30 * 32 * 32 * 4 * 4 * 2 / 1e9  # r+w of one layer
    for name, dt in ew.items():
        print(json.dumps({
            "bench": "elementwise_slope_per_layer", "layout": name,
            "us_per_layer": round(dt * 1e6, 2),
            "logical_gb_per_s": round(logical_gb / dt, 1),
        }), flush=True)

    iv = invconv_variants(args.k)
    for name, dt in iv.items():
        print(json.dumps({
            "bench": "invconv_affine_slope_per_step", "layout": name,
            "us_per_step": round(dt * 1e6, 2),
        }), flush=True)


RUNS = 30

if __name__ == "__main__":
    main()
