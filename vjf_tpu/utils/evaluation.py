"""Accuracy-style evaluation metrics mirroring the companion paper.

The paper (Zhao & Park 2020 — cited at ``/root/reference/README.md:5``)
reports ELBO trajectories and k-step forecast error on Van der Pol /
Lorenz / neural recordings; the reference code computes none of them. This
module provides the two metrics the rebuild's quality gates use:

* :func:`latent_r2` — affine-aligned R^2 of inferred latents against the
  (synthetic) ground truth. Latents are identified only up to an affine
  map, so alignment-by-least-squares is the standard comparison.
* :func:`forecast_rmse` — k-step-ahead forecast error in OBSERVATION space
  (alignment-free): from M start points along the fitted posterior, roll
  the learned dynamics forward h steps (``vjf/model.py:342-361`` semantics:
  a fresh WEIGHT SAMPLE per step, the reference's ``sampling=True`` — so
  the metric is stochastic in ``key``; ``noise=False`` only omits the
  additive state noise), decode, and compare to the actually-observed
  future. Poisson models are compared on the COUNT scale (the decode is
  the log-rate; it is exponentiated with the rate clamp, matching
  ``_impute_y``). Reported next to the persistence baseline
  (y_{t+k} := y_t), the standard "did the model learn any dynamics at
  all" reference point.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def latent_r2(mu: Array, x_true: Array) -> float:
    """Affine-aligned R^2 between inferred latents (T, xdim) and truth."""
    m = np.asarray(mu)
    x_true = np.asarray(x_true)
    big_x = np.concatenate([m, np.ones((m.shape[0], 1))], axis=1)
    a, *_ = np.linalg.lstsq(big_x, x_true, rcond=None)
    pred = big_x @ a
    return float(
        1.0 - np.sum((pred - x_true) ** 2) / np.sum((x_true - x_true.mean(0)) ** 2)
    )


def forecast_rmse(
    cfg,
    state,
    mu: Array,
    y: Array,
    key: jax.Array,
    horizon: int = 20,
    n_starts: int = 50,
    u: Optional[Array] = None,
) -> Tuple[float, float]:
    """k-step forecast RMSE in observation space vs. the persistence baseline.

    :param mu: (T, xdim) posterior means from the fit (forecast starts)
    :param y: (T, ydim) observations
    :return: (model_rmse, persistence_rmse) averaged over ``n_starts``
        evenly-spaced starts and the full ``horizon``
    """
    from ..models import vjf as core

    mu = jnp.asarray(mu)
    y = np.asarray(y)
    t_len = y.shape[0]
    if t_len < horizon + 2:
        # a shorter sequence would produce NEGATIVE start indices, which
        # silently wrap to the array end and return plausible-looking
        # garbage — fail loudly instead
        raise ValueError(
            f"forecast_rmse needs T >= horizon + 2 (got T={t_len}, "
            f"horizon={horizon}); shorten the horizon or supply more data"
        )
    starts = np.linspace(0, t_len - horizon - 2, n_starts).astype(int)

    x0 = mu[jnp.asarray(starts)]                       # (M, xdim)
    uw = None
    if u is not None:
        # (horizon, M, udim) control windows: ``u[t]`` drives the
        # transition INTO ``x[t]`` (the filter alignment,
        # ``vjf/model.py:252-258``), so the rollout from start ``s``
        # consumes ``u[s+1 : s+1+horizon]``
        u = np.asarray(u)
        uw = jnp.asarray(
            np.stack([u[s + 1 : s + 1 + horizon] for s in starts], axis=1),
            dtype=mu.dtype,
        )
    # one batched rollout: forecast() vectorizes over the batch axis
    xf, yf = core.forecast(cfg, state, x0, key, n_step=horizon, u=uw, noise=False)
    yf = np.asarray(yf)[1:]                            # (h, M, ydim), drop t0
    if cfg.likelihood == "poisson":
        # the linear decode is the LOG-rate; compare on the count scale
        # (persistence compares counts to counts) with the model's own
        # rate clamp (likelihood.py:60 semantics, as _impute_y applies it)
        yf = np.exp(np.minimum(yf, cfg.poisson_clamp))

    err_model = 0.0
    err_pers = 0.0
    for j, s in enumerate(starts):
        future = y[s + 1 : s + 1 + horizon]            # (h, ydim)
        err_model += np.mean((yf[:, j, :] - future) ** 2)
        err_pers += np.mean((y[s][None, :] - future) ** 2)
    return (
        float(np.sqrt(err_model / len(starts))),
        float(np.sqrt(err_pers / len(starts))),
    )
