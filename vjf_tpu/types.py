"""Core container types.

The reference keeps a single distribution type — a ``namedtuple`` of
(mean, logvar) for diagonal Gaussians (``/root/reference/vjf/distribution.py:3``).
A ``NamedTuple`` is automatically a JAX pytree, so the same design carries
over unchanged and flows through ``jit``/``vmap``/``scan`` for free.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array


class Gaussian(NamedTuple):
    """Diagonal Gaussian carried as (mean, log-variance).

    Mirrors the reference's ``Gaussian`` namedtuple
    (``vjf/distribution.py:3``): covariance is always diagonal and stored in
    log-space for unconstrained arithmetic.
    """

    mean: Array
    logvar: Array

    @property
    def std(self) -> Array:
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self) -> Array:
        return jnp.exp(self.logvar)


def at_least2d_gaussian(q: Gaussian) -> Gaussian:
    """Promote both members to at least 2D (batch, dim).

    Mirrors ``vjf/util.py:52-63`` (``at_least2d``).
    """
    return Gaussian(jnp.atleast_2d(q.mean), jnp.atleast_2d(q.logvar))
