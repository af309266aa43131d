"""Sharded training: GSPMD annotations for the VJF step/epoch.

Design (SURVEY.md §2.4/§5): trials shard over the ``dp`` mesh axis,
observation channels optionally over ``tp``; all model/dynamics state is
replicated (the whole model is ~1e4 params — parameter sharding would be
pure overhead) except the channel-indexed decoder rows, which ride ``tp``.
XLA's SPMD partitioner then auto-inserts the collectives the algorithm
needs: a ``psum`` of the RLS sufficient statistics ``F^T F`` / ``F^T dx``
(the contraction over the sharded trial axis in
``vjf_tpu.models.regression.rls``), the gradient/metric means, and the
channel reduction of the recognition input matmul. No hand-written
communication — the sharding annotations ARE the parallelism strategy.
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import StepFlags, VJFConfig
from ..models import vjf as core


def _tp_axis(mesh: Mesh) -> Optional[str]:
    return "tp" if "tp" in mesh.axis_names and mesh.shape.get("tp", 1) > 1 else None


def _dp_axis(mesh: Mesh) -> Optional[str]:
    return "dp" if "dp" in mesh.axis_names else mesh.axis_names[0]


def data_sharding(mesh: Mesh, ydim: int) -> NamedSharding:
    """(T, B, ydim): time replicated (sequential), trials on dp, channels on
    tp when they divide evenly."""
    tp = _tp_axis(mesh)
    if tp is not None and ydim % mesh.shape[tp] != 0:
        tp = None
    return NamedSharding(mesh, P(None, _dp_axis(mesh), tp))


def control_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(None, _dp_axis(mesh), None))


def state_shardings(cfg: VJFConfig, state: core.TrainState, mesh: Mesh):
    """Replicate everything; shard decoder rows (one per observation
    channel) over tp when it divides evenly."""
    replicated = NamedSharding(mesh, P())
    shardings = jax.tree.map(lambda _: replicated, state)
    tp = _tp_axis(mesh)
    if tp is not None and cfg.ydim % mesh.shape[tp] == 0:
        dec = state.params.decoder
        new_dec = type(dec)(
            w=NamedSharding(mesh, P("tp", None)),
            b=NamedSharding(mesh, P("tp")) if dec.b is not None else None,
        )
        shardings = shardings._replace(
            params=shardings.params._replace(decoder=new_dec)
        )
    return shardings


def shard_state(cfg: VJFConfig, state: core.TrainState, mesh: Mesh) -> core.TrainState:
    return jax.device_put(state, state_shardings(cfg, state, mesh))


def shard_data(mesh: Mesh, ys, us):
    ys = jax.device_put(ys, data_sharding(mesh, ys.shape[-1]))
    us = jax.device_put(us, control_sharding(mesh))
    return ys, us


def make_sharded_epoch(cfg: VJFConfig, flags: StepFlags, mesh: Mesh, donate: bool = True):
    """Jit ``run_epoch`` with explicit in/out shardings over ``mesh``.

    Returns ``fn(state, ys, us, key, lr) -> EpochResult`` where trials are
    sharded on dp and state stays replicated-consistent across shards (the
    RLS all-reduce guarantees every shard applies the identical dynamics
    update — the JAX equivalent of the shared dynamics posterior noted at
    SURVEY.md §2.4).

    The whole-step pallas kernel is disabled here: GSPMD does not partition
    a pallas_call, so the sharded path uses the XLA step (whose sufficient-
    statistic contractions auto-insert the psum collectives).
    """
    cfg = cfg.replace(fused_step="off")
    st_shard = None

    def fn(state, ys, us, key, lr):
        return core.run_epoch(cfg, flags, state, ys, us, key, lr)

    def build(state, ys):
        nonlocal st_shard
        st_shard = state_shardings(cfg, state, mesh)
        replicated = NamedSharding(mesh, P())
        dpax = _dp_axis(mesh)
        out_shardings = core.EpochResult(
            state=st_shard,
            q_means=NamedSharding(mesh, P(None, dpax, None)),
            q_logvars=NamedSharding(mesh, P(None, dpax, None)),
            metrics=jax.tree.map(lambda _: replicated, core.Metrics(0, 0, 0, 0)),
        )
        return jax.jit(
            fn,
            in_shardings=(
                st_shard,
                data_sharding(mesh, ys.shape[-1]),
                control_sharding(mesh),
                replicated,
                replicated,
            ),
            out_shardings=out_shardings,
            donate_argnums=(0,) if donate else (),
        )

    cache = {}

    def call(state, ys, us, key, lr):
        if "fn" not in cache:
            cache["fn"] = build(state, ys)
        return cache["fn"](state, ys, us, key, lr)

    return call
