from .modules import (
    ActNorm,
    AffineCoupling,
    BatchNormFlow,
    Conv2dNorm,
    Conv2dZeros,
    InvConv,
    Split2d,
)
from .glow import GlowStep, ListGlow
from .ddi import data_dependent_init

__all__ = [
    "ActNorm",
    "AffineCoupling",
    "BatchNormFlow",
    "Conv2dNorm",
    "Conv2dZeros",
    "InvConv",
    "Split2d",
    "GlowStep",
    "ListGlow",
    "data_dependent_init",
]
