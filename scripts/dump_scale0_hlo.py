"""Dump the optimized HLO for one scale-0 K-step chain fwd+grad and
summarize the kernel-launch profile: how many fusions/ops the backward
dispatches, and how many of them touch only tiny (<1 MB) tensors.

This is the forensic companion to probe_scale0_bwd.py: the slope probe
shows ~33% of the scale-0 backward is NOT the coupling contractions;
this script attributes it to dispatch-bound tiny-tensor fusions.
"""

from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from recurrent_flows_tpu.config import GlowConfig
from recurrent_flows_tpu.flows.glow import ListGlow

B, HW, CC, K = 30, 32, 16, 10


def main():
    cfg = GlowConfig(L=1, K=K, learn_prior=False)
    m = ListGlow(in_channels=1, image_size=HW * 2, cfg=cfg)
    kx, kc, ki = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(kx, (B, HW * 2, HW * 2, 1))
    cond = jax.random.normal(kc, (B, HW, HW, CC))
    v = m.init(ki, x, [cond], None, jax.random.key(9))
    params, consts = v["params"], v.get("consts", {})

    def nll(p, xx):
        _, out = m.apply({"params": p, "consts": consts}, xx, [cond], None,
                         dequantize=False, method="log_prob")
        return jnp.mean(out)

    def full(p, xx):
        l, gp = jax.value_and_grad(nll)(p, xx)
        gx = jax.grad(nll, argnums=1)(p, xx)
        return l + jnp.sum(gx) + sum(
            jnp.sum(t) for t in jax.tree_util.tree_leaves(gp))

    compiled = jax.jit(full).lower(params, x).compile()
    txt = compiled.as_text()

    # Top-level instructions of the entry computation = kernel launches
    # (fusions, convs, custom-calls). Parse the ENTRY block.
    entry = re.search(r"ENTRY[^{]*\{(.*?)\n\}", txt, re.S)
    body = entry.group(1) if entry else txt
    counts = collections.Counter()
    tiny = big = 0
    lines = []
    for ln in body.splitlines():
        ln = ln.strip()
        mo = re.match(r"%?[\w.\-]+ = (\S+?)(\{|\(| )", ln)
        if not mo:
            continue
        shape_tok = mo.group(1)
        op = re.search(r"= \S+ (\w+)\(", ln)
        opname = op.group(1) if op else "?"
        if opname in ("parameter", "constant", "tuple", "get"):
            continue
        # estimate output bytes from the shape token, e.g. f32[30,32,32,256]
        dims = re.match(r"(\w+)\[([\d,]*)\]", shape_tok)
        nbytes = None
        if dims:
            dt, dd = dims.groups()
            n = 1
            for d in (dd.split(",") if dd else []):
                n *= int(d)
            bs = {"f32": 4, "bf16": 2, "s32": 4, "pred": 1, "u32": 4,
                  "f16": 2, "s8": 1, "u8": 1}.get(dt, 4)
            nbytes = n * bs
            if nbytes < 1 << 20:
                tiny += 1
            else:
                big += 1
        counts[opname] += 1
        lines.append((nbytes or 0, opname, shape_tok, ln[:110]))

    total = sum(counts.values())
    print(f"entry-computation kernel launches: {total}")
    print(f"  tiny (<1MB output): {tiny}   big: {big}")
    print(f"  per GlowStep (K={K}): {total / K:.1f} launches")
    print("\nop histogram:")
    for op, c in counts.most_common():
        print(f"  {op:22s} {c}")
    print("\nlargest 8 outputs:")
    for nb, opn, sh, ln in sorted(lines, reverse=True)[:8]:
        print(f"  {nb/1e6:8.1f} MB  {opn:10s} {sh}")
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    print(f"\ncost analysis: {cost.get('flops', 0)/1e9:.1f} GFLOP, "
          f"{cost.get('bytes accessed', 0)/1e9:.2f} GB touched")
    out = "/tmp/scale0_fwdgrad.hlo"
    with open(out, "w") as f:
        f.write(txt)
    print(f"full HLO written to {out}")


if __name__ == "__main__":
    main()
