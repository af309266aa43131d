"""Cholesky-form Kalman toolkit (predict / update / Joseph update).

Functional rewrite of ``/root/reference/vjf/kalman.py``. The state here is
whatever you point it at — in this framework it is applied in *weight space*
by the Bayesian linear regression (``vjf/module.py:114-142``): the "state"
is the regression weight matrix, H is the feature matrix, and the latent
posterior never touches this module (it always comes from the recognition
network).

Covariances are carried as lower Cholesky factors end-to-end; the Joseph
form (``vjf/kalman.py:102-145``) is the numerically-stable live path and
assumes diagonal R, which is all the framework ever uses.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import Array

from .linalg import cho_solve, safe_cholesky, tril_solve


def predict(
    x: Array,
    chol_v: Array,
    a: Array,
    q: Array,
    h: Array,
    cholesky: bool = True,
) -> Tuple[Array, Array, Array]:
    """Time update: ``x' = A x``, ``V' = A V A^T + Q`` — ``vjf/kalman.py:15-50``.

    :param x: state mean, (xdim, batch)
    :param chol_v: lower Cholesky of state covariance (or full covariance if
        ``cholesky=False``), (xdim, xdim)
    :param a: transition matrix, (xdim, xdim)
    :param q: process-noise covariance, (xdim, xdim)
    :param h: observation matrix, (ydim, xdim)
    :return: (yhat, xhat, chol_vhat)
    """
    xhat = a @ x
    chol = chol_v if cholesky else safe_cholesky(chol_v)
    al = a @ chol
    vhat = al @ al.T + q
    yhat = h @ xhat
    return yhat, xhat, safe_cholesky(vhat) if cholesky else vhat


def update(
    y: Array,
    yhat: Array,
    xhat: Array,
    chol_vhat: Array,
    h: Array,
    r: Array,
    cholesky: bool = True,
) -> Tuple[Array, Array]:
    """Standard innovation update ``V = Vhat - G G^T`` — ``vjf/kalman.py:53-99``.

    The subtraction can lose positive-definiteness (the reference comments
    "minus is dangerous" at ``kalman.py:90``); prefer :func:`joseph_update`.
    """
    e = y - yhat
    lhat = chol_vhat if cholesky else safe_cholesky(chol_vhat)
    vhat = lhat @ lhat.T
    hl = h @ lhat
    s = hl @ hl.T + r
    ls = safe_cholesky(s)
    g = tril_solve(ls, h @ vhat).T           # G: (xdim, ydim); G G^T = K S K^T
    x = xhat + g @ tril_solve(ls, e)
    v = vhat - g @ g.T
    if cholesky:
        v = safe_cholesky(v)
    return x, v


def joseph_update(
    y: Array,
    yhat: Array,
    xhat: Array,
    chol_vhat: Array,
    h: Array,
    r: Array,
    cholesky: bool = True,
    quirk: bool = False,
) -> Tuple[Array, Array]:
    """Joseph-form measurement update.

    ``V = (I - K H) Vhat (I - K H)^T + K R K^T`` with the gain from one
    Cholesky solve; assumes R diagonal (only its elementwise ``sqrt`` is
    used as a matrix square root, matching ``vjf/kalman.py:139``).

    Deliberate deviation from ``vjf/kalman.py:102-145``: the reference
    computes ``G = S^{-1} H Vhat`` *and then* re-applies ``cholesky_solve``
    to the innovation / H / sqrt(R) (``kalman.py:131-139``), so its
    effective gain is ``K S^{-1}`` — a double application of the innovation
    precision. We implement the standard Joseph update, validated by the
    invariant ``kalman(diffusion=0) == rls`` (exact Bayesian update), which
    the reference's version does not satisfy.

    ``quirk=True`` replicates the reference's double-``S^{-1}`` behavior
    bit-for-bit (the strict-parity mode, mirroring ``gaussian_loss``'s
    ``trace_quirk``): the gain applied to the innovation, to H inside the
    Joseph sandwich, and to ``sqrt(R)`` is ``K S^{-1}`` exactly as at
    ``vjf/kalman.py:131-139``. Parity-tested against the live torch
    reference in ``tests/test_components.py``.
    """
    e = y - yhat
    lhat = chol_vhat if cholesky else safe_cholesky(chol_vhat)
    vhat = lhat @ lhat.T
    hl = h @ lhat
    s = hl @ hl.T + r
    ls = safe_cholesky(s)
    g = cho_solve(ls, h @ vhat).T            # K = Vhat H^T S^{-1}
    eye = jnp.eye(vhat.shape[0], dtype=vhat.dtype)
    if quirk:
        x = xhat + g @ cho_solve(ls, e)
        i_kh = eye - g @ cho_solve(ls, h)
        kr = g @ cho_solve(ls, jnp.sqrt(r))  # R assumed diagonal
    else:
        x = xhat + g @ e
        i_kh = eye - g @ h
        kr = g @ jnp.sqrt(r)                 # R assumed diagonal
    i_kh_l = i_kh @ lhat
    v = i_kh_l @ i_kh_l.T + kr @ kr.T
    if cholesky:
        v = safe_cholesky(v)
    return x, v
