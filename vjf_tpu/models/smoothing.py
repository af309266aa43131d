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
    q = jnp.exp(state.dynamics.logvar) * jnp.eye(cfg.xdim, dtype=cfg.jdtype)
    h = state.params.decoder.w                       # (ydim, xdim)
    r = jnp.exp(state.params.likelihood.logvar) * jnp.eye(cfg.ydim, dtype=cfg.jdtype)
    m0 = state.params.prior.mean
    p0 = jnp.diag(jnp.exp(state.params.prior.logvar))

    # absorb affine offsets: y - d - H (accumulated c) — handle c by state
    # augmentation-free trick: subtract the decoder bias, and fold c into a
    # shifted coordinate x' = x - x*, where x* solves (I - A) x* = c.
    eye = jnp.eye(cfg.xdim, dtype=cfg.jdtype)
    x_star = jnp.linalg.solve(eye - a + 1e-6 * eye, c)
    y_eff = ys - state.params.decoder.b - (h @ x_star)
    m0_eff = m0 - x_star

    filtered, smoothed = pkalman.parallel_smooth(a, q, h, r, m0_eff, p0, y_eff)
    return (
        pkalman.FilterResult(filtered.means + x_star, filtered.covs),
        pkalman.SmoothResult(smoothed.means + x_star, smoothed.covs),
    )
