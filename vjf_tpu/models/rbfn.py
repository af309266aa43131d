"""Non-Bayesian RBF network.

Counterpart of ``/root/reference/vjf/module.py:153-173`` (``RBFN``): a plain
RBF -> Linear network with normally-initialized centroids and a learnable
log-scale, trained by gradients (no closed-form updates). The reference
keeps it as a standalone building block (exercised by
``test/test_module.py:18-27``) rather than wiring it into VJF; provided here
for the same reason — e.g. as a gradient-trained velocity field baseline.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from ..ops.functional import rbf
from .recognition import LinearParams, apply_linear, init_linear


class RBFNParams(NamedTuple):
    centroid: Array    # (n_basis, in_features) ~ N(0, 1)
    logscale: Array    # (1, n_basis), broadcast over batch
    out: LinearParams  # basis -> output


def init_rbfn(
    key: jax.Array,
    in_features: int,
    out_features: int,
    n_basis: int,
    bias: bool = True,
    dtype=jnp.float32,
) -> RBFNParams:
    kc, ko = jax.random.split(key)
    return RBFNParams(
        centroid=jax.random.normal(kc, (n_basis, in_features), dtype),
        logscale=jnp.zeros((1, n_basis), dtype),
        out=init_linear(ko, n_basis, out_features, bias=bias, dtype=dtype),
    )


def apply_rbfn(params: RBFNParams, x: Array) -> Array:
    h = rbf(x, params.centroid, jnp.exp(params.logscale[0]))
    return apply_linear(params.out, h)
