from . import (
    decoder,
    dynamics,
    evaluate,
    likelihoods,
    rbf,
    rbfn,
    recognition,
    regression,
    smoothing,
    vjf,
)
from .dynamics import DynamicsState
from .rbfn import RBFNParams, apply_rbfn, init_rbfn
from .vjf import Metrics, Params, TrainState, filter_step, fit, forecast, init_state, run_epoch

__all__ = [
    "decoder",
    "dynamics",
    "evaluate",
    "likelihoods",
    "rbf",
    "recognition",
    "regression",
    "smoothing",
    "vjf",
    "DynamicsState",
    "Metrics",
    "Params",
    "TrainState",
    "filter_step",
    "fit",
    "forecast",
    "init_state",
    "run_epoch",
]
