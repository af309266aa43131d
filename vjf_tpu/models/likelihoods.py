"""GLM observation likelihoods.

Functional counterparts of ``/root/reference/vjf/likelihood.py``:

* Gaussian — scalar learnable log-variance (init log 0.1), whose value is
  driven by *both* the SGD step and a running-variance overwrite each step
  (``likelihood.py:28-40``) — the overwrite happens after the SGD step and
  wins, which we replicate exactly.
* Poisson — canonical log-link with the rate clamp ``eta <= 10``
  (``likelihood.py:60``); its non-gradient update is a no-op.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
from jax import Array

from ..ops.functional import batch_weighted_mean, gaussian_loss, running_var


class GaussianLikParams(NamedTuple):
    logvar: Array   # scalar, SGD-trained AND running-var overwritten


class PoissonLikParams(NamedTuple):
    """No parameters — kept as an (empty-leaf) pytree for uniform structure."""

    empty: None = None


def init_gaussian_lik(init_logvar: float, dtype=jnp.float32) -> GaussianLikParams:
    return GaussianLikParams(logvar=jnp.asarray(init_logvar, dtype=dtype))


def init_poisson_lik(dtype=jnp.float32) -> PoissonLikParams:
    del dtype
    return PoissonLikParams()


def gaussian_nll(
    params: GaussianLikParams, eta: Array, target: Array,
    weights: Optional[Array] = None,
    channel_mask: Optional[Array] = None,
) -> Array:
    """``gaussian_loss(target, eta, logvar)`` — ``likelihood.py:19-26``.

    ``channel_mask``: optional (B, ydim) 0/1 — missing observations; a
    masked entry's term is dropped from the channel sum (exact likelihood
    of the observed entries).
    """
    return gaussian_loss(target, eta, params.logvar, weights=weights,
                         channel_mask=channel_mask)


def poisson_nll(
    eta: Array, target: Array, clamp: float = 10.0,
    weights: Optional[Array] = None,
    channel_mask: Optional[Array] = None,
) -> Array:
    """Canonical-link Poisson NLL, rate clamp at ``clamp``; sum over
    channels, mean over batch — ``likelihood.py:51-62`` (torch
    ``poisson_nll_loss(log_input=True, full=False)`` semantics:
    ``exp(eta) - target * eta``). ``weights``: optional (B,) 0/1 trial
    mask; ``channel_mask``: optional (B, ydim) 0/1 missing-observation
    mask (masked entries drop out of the channel sum).
    """
    eta = jnp.minimum(eta, clamp)
    nll = jnp.exp(eta) - target * eta
    if channel_mask is not None:
        nll = jnp.where(channel_mask > 0, nll, 0.0)
    return batch_weighted_mean(jnp.sum(nll, axis=-1), weights)


def gaussian_lik_update(
    params: GaussianLikParams,
    n_sample: Array,
    eta: Array,
    target: Array,
    size_cap: int = 1000,
    logvar_clamp: float = 30.0,
    weights: Optional[Array] = None,
    channel_mask: Optional[Array] = None,
) -> Tuple[GaussianLikParams, Array]:
    """Running-variance overwrite of the observation noise —
    ``likelihood.py:28-40``. ``new_size`` is the batch size (rows), the mse
    averages over batch *and* channels, matching the reference. The clamp
    is a runaway guard (see VJFConfig.logvar_clamp). With ``weights`` (a
    (B,) 0/1 trial mask), masked rows are excluded from the mse and the
    sample count; an all-masked batch is a no-op. With ``channel_mask``
    (a (B, ydim) 0/1 missing-observation mask, folded with ``weights``),
    the mse runs over the observed entries only and the sample count is
    the fractional row count ``sum(mask) / ydim``.
    """
    if channel_mask is not None:
        m = channel_mask.astype(eta.dtype)
        if weights is not None:
            m = m * weights.astype(eta.dtype)[:, None]
        sq = jnp.where(m > 0, jnp.square(target - eta), 0.0) * m
        mse = jnp.sum(sq) / jnp.maximum(jnp.sum(m), 1.0)
        count = jnp.sum(m) / eta.shape[-1]
    elif weights is None:
        mse = jnp.mean(jnp.square(target - eta))
        count = eta.shape[0]
    else:
        mse = batch_weighted_mean(
            jnp.mean(jnp.square(target - eta), axis=-1), weights
        )
        count = jnp.sum(weights.astype(eta.dtype))
    var, n_new = running_var(
        jnp.exp(params.logvar), n_sample, mse, count, size_cap=size_cap
    )
    logvar = jnp.clip(jnp.log(var), -logvar_clamp, logvar_clamp)
    # gate on the VARIANCE: inf/NaN (overflowing mse) is skipped; var == 0
    # (log = -inf) legitimately clamps to the floor
    ok = jnp.isfinite(var)
    n_sample = jnp.asarray(n_sample)
    return (
        GaussianLikParams(logvar=jnp.where(ok, logvar, params.logvar)),
        jnp.where(ok, jnp.asarray(n_new).astype(n_sample.dtype), n_sample),
    )
