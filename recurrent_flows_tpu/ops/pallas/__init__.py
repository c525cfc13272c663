from .fused import (
    coupling_transform,
    actnorm_invconv,
    convlstm_gates,
    pallas_enabled,
)

__all__ = [
    "coupling_transform",
    "actnorm_invconv",
    "convlstm_gates",
    "pallas_enabled",
]
