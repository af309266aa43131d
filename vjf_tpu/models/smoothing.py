"""Post-hoc parallel smoothing of a trained VJF model.

The online filter is causal; once a model is learned, the latents can be
re-inferred *offline* with future information. For the Gaussian-likelihood
model the learned system is locally linear-Gaussian — linearize the RBF (or
SGP) velocity field at a reference point and run the O(log T)-depth
associative-scan RTS smoother (:mod:`vjf_tpu.ops.pkalman`). This is a
capability beyond the reference (which has no smoother at all).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..config import VJFConfig
from ..ops import pkalman
from .vjf import TrainState, _transition


def linearize_dynamics(
    cfg: VJFConfig, state: TrainState, x_ref: Optional[Array] = None
) -> Tuple[Array, Array]:
    """First-order model ``x[t] ~= A x[t-1] + c`` of the learned transition
    mean around ``x_ref`` (default: origin)."""
    tr = _transition(cfg)
    if x_ref is None:
        x_ref = jnp.zeros((cfg.xdim,), cfg.jdtype)

    def mean_fn(x):
        g = tr.transition_gaussian(state.dynamics, x[None, :], None, cfg.leak)
        return g.mean[0]

    a = jax.jacfwd(mean_fn)(x_ref)
    c = mean_fn(x_ref) - a @ x_ref
    return a, c


def smooth(
    cfg: VJFConfig,
    state: TrainState,
    ys: Array,
    x_ref: Optional[Array] = None,
) -> Tuple[pkalman.FilterResult, pkalman.SmoothResult]:
    """Parallel RTS smoothing of one observation sequence (T, ydim).

    Gaussian likelihood only (the Poisson model is not an LGSSM; smooth a
    Gaussian approximation or use the online filter). Controls are folded
    into the linearization point's velocity; for strongly input-driven
    systems linearize per-regime and stitch.
    """
    if cfg.likelihood != "gaussian":
        raise NotImplementedError("parallel smoothing requires the Gaussian likelihood")
    ys = jnp.asarray(ys, cfg.jdtype)
    if ys.ndim != 2:
        raise ValueError("smooth() takes one (T, ydim) sequence")

    a, c = linearize_dynamics(cfg, state, x_ref)
    return _smooth_affine(cfg, state, ys, a, c)


def _system_matrices(cfg: VJFConfig, state: TrainState):
    q = jnp.exp(state.dynamics.logvar) * jnp.eye(cfg.xdim, dtype=cfg.jdtype)
    h = state.params.decoder.w                       # (ydim, xdim)
    r = jnp.exp(state.params.likelihood.logvar) * jnp.eye(cfg.ydim, dtype=cfg.jdtype)
    m0 = state.params.prior.mean
    p0 = jnp.diag(jnp.exp(state.params.prior.logvar))
    return q, h, r, m0, p0


def _smooth_affine(cfg, state, ys, a, c):
    """Run the parallel smoother for (possibly per-step) affine dynamics."""
    q, h, r, m0, p0 = _system_matrices(cfg, state)
    y_eff = ys - state.params.decoder.b
    return pkalman.parallel_smooth(a, q, h, r, m0, p0, y_eff, b=c)


def smooth_iterated(
    cfg: VJFConfig,
    state: TrainState,
    ys: Array,
    n_iter: int = 3,
    x_ref: Optional[Array] = None,
) -> Tuple[pkalman.FilterResult, pkalman.SmoothResult]:
    """Iterated extended smoothing: re-linearize the learned velocity field
    along the previous smoothed trajectory (per-timestep A_t, c_t) and
    re-run the parallel smoother — the associative-scan analogue of the
    iterated extended Kalman smoother. Each pass is O(log T) depth."""
    if cfg.likelihood != "gaussian":
        raise NotImplementedError("parallel smoothing requires the Gaussian likelihood")
    ys = jnp.asarray(ys, cfg.jdtype)
    tr = _transition(cfg)

    def mean_fn(x):
        g = tr.transition_gaussian(state.dynamics, x[None, :], None, cfg.leak)
        return g.mean[0]

    filtered, smoothed = smooth(cfg, state, ys, x_ref)
    for _ in range(max(0, n_iter - 1)):
        # transition INTO t linearized at the smoothed mean of t-1
        pts = jnp.concatenate(
            [state.params.prior.mean[None], smoothed.means[:-1]], axis=0
        )
        a_seq = jax.vmap(jax.jacfwd(mean_fn))(pts)          # (T, x, x)
        c_seq = jax.vmap(mean_fn)(pts) - jnp.einsum("tij,tj->ti", a_seq, pts)
        filtered, smoothed = _smooth_affine(cfg, state, ys, a_seq, c_seq)
    return filtered, smoothed
