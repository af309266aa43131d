from .ensemble import EnsembleFitResult, fit_ensemble, forecast_ensemble
from .mesh import make_mesh
from .replicated import init_ensemble, run_epoch_ensemble, shard_ensemble
from .sharded import (
    data_sharding,
    make_sharded_epoch,
    make_sharded_epochs,
    run_epoch_sync_every,
    shard_data,
    shard_state,
    state_shardings,
)

__all__ = [
    "EnsembleFitResult",
    "fit_ensemble",
    "forecast_ensemble",
    "make_mesh",
    "init_ensemble",
    "run_epoch_ensemble",
    "shard_ensemble",
    "data_sharding",
    "make_sharded_epoch",
    "make_sharded_epochs",
    "run_epoch_sync_every",
    "shard_data",
    "shard_state",
    "state_shardings",
]
