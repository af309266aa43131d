"""vjf_tpu — TPU-native variational joint filtering.

A ground-up JAX/XLA re-design of catniplab/vjf (Zhao & Park 2020,
"Variational Online Learning of Neural Dynamics"): online filtering of
nonlinear state-space models with an amortized recognition network (SGD)
and Bayesian RBF / sparse-GP dynamics (closed-form RLS/Kalman updates),
fused per-timestep into a single compiled ``lax.scan`` body, batched over
trials, and sharded across TPU meshes.

Quick start (mirrors the reference API)::

    from vjf_tpu import VJF
    model = VJF.make_model(ydim=20, xdim=2, n_rbf=100,
                           hidden_sizes=[20], likelihood='gaussian')
    mu, logvar, loss = model.fit(y, max_iter=150)
    x, y_hat = model.forecast(mu[9, 0], n_step=1000)

Functional core: ``vjf_tpu.models.vjf`` (explicit state pytrees, jit/scan).
"""
from . import config, models, ops, parallel, types, utils
from .api import VJF
from .config import StepFlags, VJFConfig
from .types import Gaussian
from .utils.ragged import pad_trials, split_trials

__version__ = "0.1.0"

__all__ = [
    "VJF",
    "VJFConfig",
    "StepFlags",
    "Gaussian",
    "pad_trials",
    "split_trials",
    "config",
    "models",
    "ops",
    "parallel",
    "types",
    "utils",
]
