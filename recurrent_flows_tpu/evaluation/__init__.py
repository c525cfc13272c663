from .metrics import mse, psnr, ssim, eval_seq
from .fvd import frechet_distance, fvd
from .lpips import lpips_distance
from .evaluator import Evaluator

__all__ = [
    "mse",
    "psnr",
    "ssim",
    "eval_seq",
    "frechet_distance",
    "fvd",
    "lpips_distance",
    "Evaluator",
]
