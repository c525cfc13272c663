"""Data-dependent (ActNorm) initialization as an explicit functional pass.

The reference initializes each ActNorm in-place on the first training batch
(Flow/glow_modules.py:22-36) — not expressible under jit. Here the model is
applied once in ``ddi=True`` mode: every ActNorm computes its statistics from
its own input (which has already passed through the DDI'd upstream layers,
because each layer *uses* its freshly computed values), sows them into the
``'ddi'`` collection, and this helper merges them into the params pytree.
One pass, sequentially-consistent, pure.
"""

from __future__ import annotations

from typing import Any, Callable, Dict



def merge_ddi(params: Dict[str, Any], ddi: Dict[str, Any]) -> Dict[str, Any]:
    """Overwrite params leaves with same-path leaves sown into ``ddi``."""

    def _merge(p, d):
        out = dict(p)
        for k, v in d.items():
            if isinstance(v, dict):
                out[k] = _merge(p[k], v)
            else:
                out[k] = v
        return out

    return _merge(params, ddi)


def data_dependent_init(variables: Dict[str, Any], ddi_apply: Callable) -> Dict[str, Any]:
    """Run ``ddi_apply(variables)`` (an apply with mutable=['ddi']) and merge.

    ``ddi_apply`` must return ``(out, mutated)`` where ``mutated['ddi']``
    mirrors the params tree structure. Returns new variables.
    """
    _, mutated = ddi_apply(variables)
    ddi = mutated.get("ddi", {})
    new_params = merge_ddi(dict(variables["params"]), dict(ddi))
    new_vars = dict(variables)
    new_vars["params"] = new_params
    return new_vars
