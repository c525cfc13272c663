from .mol import (
    DiscretizedMixtureLogits,
    DiscretizedMixtureLogits1d,
    mol_log_prob_1d,
    mol_log_prob_rgb,
    mol_sample_1d,
    mol_sample_rgb,
)

__all__ = [
    "DiscretizedMixtureLogits",
    "DiscretizedMixtureLogits1d",
    "mol_log_prob_1d",
    "mol_log_prob_rgb",
    "mol_sample_1d",
    "mol_sample_rgb",
]
