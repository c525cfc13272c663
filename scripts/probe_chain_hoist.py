#!/usr/bin/env python
"""Is the glowchain prep (LU solves + [K,...] weight stacks) hoisted out
of the sampling frame scan? Compiles the production predict rollout with
chain_impl='sample' and histograms the ops inside while-loop bodies vs
ENTRY. Precedent: the round-3 check that proved the inverse-1x1
triangular solves are LICM-hoisted on the module path (docs/PERF.md)."""

from __future__ import annotations

import collections
import dataclasses
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from recurrent_flows_tpu.configs import rfn_mnist_production
from recurrent_flows_tpu.models import RFN
from recurrent_flows_tpu.utils.compilation_cache import enable as _enable_cache


def main():
    chain = sys.argv[1] if len(sys.argv) > 1 else "sample"
    _enable_cache()
    cfg, tcfg = rfn_mnist_production()
    cfg = dataclasses.replace(
        cfg, glow=dataclasses.replace(cfg.glow, chain_impl=chain))
    model = RFN(cfg)
    b = tcfg.batch_size
    x = jax.random.uniform(
        jax.random.key(0), (b, 5, cfg.image_size, cfg.image_size, 1)) - 0.5
    variables = model.init(jax.random.key(1), x[:2, :2], jax.random.key(2))

    @jax.jit
    def rollout(v, x, key):
        _, preds = model.apply(v, x, 10, 5, key, method="predict")
        return jnp.sum(preds)

    txt = rollout.lower(variables, x, jax.random.key(3)).compile().as_text()
    dump = os.environ.get("HLO_DUMP")
    if dump:
        open(dump, "w").write(txt)
        print("dumped", dump, len(txt), flush=True)
    # split computations; while bodies are those named *body* or referenced
    # by while ops' body= attributes
    comps = re.split(r"\n(?=%?\w[\w.-]* \()", txt)
    interesting = ("triangular-solve", "custom-call", "dynamic-update-slice",
                   "concatenate", "dot", "convolution")
    for comp in comps:
        header = comp.split("\n", 1)[0][:80]
        is_body = "body" in header.lower()
        is_entry = comp.lstrip().startswith("ENTRY")
        if not (is_body or is_entry):
            continue
        hist = collections.Counter()
        for op in interesting:
            hist[op] = len(re.findall(rf"\b{op}\b", comp))
        hist = {k: v for k, v in hist.items() if v}
        print(("ENTRY " if is_entry else "BODY  ") + header.strip())
        print("   ", hist, flush=True)


if __name__ == "__main__":
    main()
