from .moving_mnist import (MovingMNIST, load_mnist_digits,
                           sklearn_digit_bank, synthetic_digit_bank)
from .shapes import MovingShapes, sample_moving_shapes
from .sinusoids import SinusWithNoise, sample_sinusoids
from .halfmoon import RotatingTwoMoonsConditionalSampler, two_moons
from .kth import KTH
from .bair import PushDataset
from .celeba import get_celeba, get_joint_conditioned_data, prepare_celeba

__all__ = [
    "MovingMNIST",
    "load_mnist_digits",
    "synthetic_digit_bank",
    "sklearn_digit_bank",
    "MovingShapes",
    "sample_moving_shapes",
    "SinusWithNoise",
    "sample_sinusoids",
    "RotatingTwoMoonsConditionalSampler",
    "two_moons",
    "KTH",
    "PushDataset",
    "prepare_celeba",
    "get_celeba",
    "get_joint_conditioned_data",
]
