from . import functional, kalman, linalg, pkalman
from .functional import (
    finite_or_zero,
    gaussian_entropy,
    gaussian_loss,
    nonecat,
    rbf,
    reparametrize,
    running_var,
    sample,
)

__all__ = [
    "functional",
    "kalman",
    "linalg",
    "rbf",
    "gaussian_entropy",
    "gaussian_loss",
    "reparametrize",
    "sample",
    "running_var",
    "nonecat",
    "finite_or_zero",
]
