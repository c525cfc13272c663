from .moving_mnist import MovingMNIST, load_mnist_digits, synthetic_digit_bank

__all__ = ["MovingMNIST", "load_mnist_digits", "synthetic_digit_bank"]
