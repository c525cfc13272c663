from .numerics import (
    batch_reduce,
    free_bits_kl,
    normal_kl,
    normal_log_prob,
    normal_sample,
    split_feature,
    squeeze2d,
    unsqueeze2d,
)

__all__ = [
    "batch_reduce",
    "free_bits_kl",
    "normal_kl",
    "normal_log_prob",
    "normal_sample",
    "split_feature",
    "squeeze2d",
    "unsqueeze2d",
]
