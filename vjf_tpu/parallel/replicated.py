"""Replicated / ensemble filtering: many independent models in lockstep.

The scaling analysis (docs/ARCHITECTURE.md §4) shows that for VJF's tiny
per-step state, the profitable multi-chip regime is *independent* filters
per device rather than one shared posterior with per-step collectives.
Because the whole framework is pure functions over pytrees, an ensemble is
literally one ``vmap``: N models (different seeds, or different
hyperparameter draws folded into the data) train simultaneously on the
same or different sequences — on one chip via vmap batching, across chips
by sharding the model axis of the vmapped state.

Typical uses: seed ensembles for posterior robustness, per-subject models
in multi-subject neural recordings, hyperparameter sweeps.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import StepFlags, VJFConfig
from ..models import vjf as core


def init_ensemble(key: jax.Array, cfg: VJFConfig, n_models: int,
                  backend: Optional[str] = None):
    """Stack of N independently-initialized TrainStates (leading model axis)."""
    keys = jax.random.split(key, n_models)
    return jax.vmap(lambda k: core.init_state(k, cfg, backend=backend))(keys)


def run_epoch_ensemble(
    cfg: VJFConfig,
    flags: StepFlags,
    states,
    ys,
    us,
    keys,
    lr,
):
    """One epoch for every ensemble member at once.

    :param states: vmapped TrainState stack (N leading axis)
    :param ys: (N, T, B, ydim) — or broadcast one sequence with
        ``jnp.broadcast_to`` for a seed ensemble on shared data
    :param keys: (N,) PRNG keys (distinct noise streams per member)
    :return: vmapped EpochResult (N leading axis everywhere)
    """
    fn = lambda st, y, u, k: core.run_epoch(cfg, flags, st, y, u, k, lr)
    return jax.vmap(fn)(states, ys, us, keys)


def shard_ensemble(states, mesh: Mesh, axis: str = "dp"):
    """Place the model axis of a vmapped state stack across devices —
    zero-communication multi-chip scaling (each chip runs whole filters)."""
    def shard_leaf(leaf):
        spec = P(axis, *([None] * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(shard_leaf, states)
