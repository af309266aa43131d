"""RBF featurizer parameters.

Functional counterpart of ``/root/reference/vjf/module.py:14-34`` (``RBF``):
centroids initialized U[-2, 2), log-widths at 0, frozen by default (they are
re-initialized data-dependently after warm-up, never SGD-trained — the
reference registers them with ``requires_grad=False``). Optional intercept
column of ones (``vjf/module.py:32-33``).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from ..ops.functional import rbf as _rbf


class RBFParams(NamedTuple):
    centroid: Array   # (n_basis, n_dim)
    logwidth: Array   # (n_basis,)


def init_rbf(
    key: jax.Array,
    n_dim: int,
    n_basis: int,
    init_range: float = 2.0,
    dtype=jnp.float32,
) -> RBFParams:
    centroid = jax.random.uniform(
        key, (n_basis, n_dim), dtype=dtype, minval=-init_range, maxval=init_range
    )
    return RBFParams(centroid=centroid, logwidth=jnp.zeros((n_basis,), dtype=dtype))


def n_feature(params: RBFParams, intercept: bool = False) -> int:
    return params.centroid.shape[0] + (1 if intercept else 0)


def apply_rbf(params: RBFParams, x: Array, intercept: bool = False) -> Array:
    """Evaluate the basis — ``vjf/module.py:30-34``. x: (..., B, n_dim)."""
    out = _rbf(x, params.centroid, jnp.exp(params.logwidth))
    if intercept:
        ones = jnp.ones(out.shape[:-1] + (1,), dtype=out.dtype)
        out = jnp.concatenate([ones, out], axis=-1)
    return out


def reinit_rbf(
    key: jax.Array, params: RBFParams, x: Array
) -> RBFParams:
    """Data-dependent re-initialization used after warm-up.

    ``r = max ||x||``; centroids ~ U[-r, r], logwidth = log r — mirrors
    ``LinearRegression.initialize`` (``vjf/module.py:144-148``).
    """
    r = jnp.max(jnp.linalg.norm(x, axis=-1))
    centroid = jax.random.uniform(
        key, params.centroid.shape, dtype=params.centroid.dtype, minval=-1.0, maxval=1.0
    ) * r
    logwidth = jnp.full_like(params.logwidth, jnp.log(r))
    return RBFParams(centroid=centroid, logwidth=logwidth)
