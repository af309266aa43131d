"""Covariance functions for the sparse-GP dynamics.

API surface recovered from the reference's ``test/test_sgp.py:9,17``
(``vjf.gp.covfun.SquaredExponential(scale, lengthscale)``); the module
itself is absent from the reference snapshot (SURVEY.md §2.3).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from jax import Array


@dataclass(frozen=True)
class CovarianceFunction:
    def __call__(self, x1: Array, x2: Array) -> Array:
        raise NotImplementedError

    def diag(self, x: Array) -> Array:
        raise NotImplementedError


def _sqdist(x1: Array, x2: Array) -> Array:
    a = jnp.sum(x1 * x1, axis=-1, keepdims=True)
    b = jnp.sum(x2 * x2, axis=-1)
    return jnp.maximum(a + b - 2.0 * (x1 @ x2.T), 0.0)


@dataclass(frozen=True)
class SquaredExponential(CovarianceFunction):
    """``k(x, y) = scale^2 exp(-||x - y||^2 / (2 l^2))``."""

    scale: float = 1.0
    lengthscale: float = 1.0

    def __call__(self, x1: Array, x2: Array) -> Array:
        d2 = _sqdist(jnp.atleast_2d(x1), jnp.atleast_2d(x2))
        return self.scale**2 * jnp.exp(-0.5 * d2 / self.lengthscale**2)

    def diag(self, x: Array) -> Array:
        x = jnp.atleast_2d(x)
        return jnp.full(x.shape[:-1], self.scale**2, dtype=x.dtype)


@dataclass(frozen=True)
class Matern52(CovarianceFunction):
    """Matern 5/2 — a rougher alternative for less-smooth velocity fields."""

    scale: float = 1.0
    lengthscale: float = 1.0

    def __call__(self, x1: Array, x2: Array) -> Array:
        d = jnp.sqrt(_sqdist(jnp.atleast_2d(x1), jnp.atleast_2d(x2)) + 1e-12)
        r = jnp.sqrt(5.0) * d / self.lengthscale
        return self.scale**2 * (1.0 + r + r * r / 3.0) * jnp.exp(-r)

    def diag(self, x: Array) -> Array:
        x = jnp.atleast_2d(x)
        return jnp.full(x.shape[:-1], self.scale**2, dtype=x.dtype)
