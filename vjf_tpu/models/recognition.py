"""Amortized recognition (filtering) network.

Functional counterpart of ``/root/reference/vjf/recognition.py:16-42``: an
MLP over ``concat(y, u, q_prev.mean, q_prev.logvar)`` with Tanh activations
and two linear heads — ``mean`` (no bias) and ``logvar`` (bias) — producing
the diagonal-Gaussian filtering posterior q[t].

Parameters are a plain pytree; initialization matches torch's
``nn.Linear`` default (Kaiming-uniform: W, b ~ U[-1/sqrt(fan_in), ...]) so
that un-injected runs are distributionally comparable to the reference.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..ops.functional import nonecat
from ..types import Gaussian


class LinearParams(NamedTuple):
    w: Array                    # (out, in) — torch layout, y = x @ w.T + b
    b: Optional[Array] = None   # (out,) or None


class RecognitionParams(NamedTuple):
    layers: Tuple[LinearParams, ...]   # hidden stack, Tanh between
    mean: LinearParams                 # head, bias=False (recognition.py:27)
    logvar: LinearParams               # head, bias=True  (recognition.py:28)


def init_linear(
    key: jax.Array, n_in: int, n_out: int, bias: bool = True, dtype=jnp.float32
) -> LinearParams:
    """torch ``nn.Linear`` default init: U[-k, k], k = 1/sqrt(fan_in)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.asarray(n_in, dtype=jnp.float32))
    w = jax.random.uniform(kw, (n_out, n_in), dtype=dtype, minval=-bound, maxval=bound)
    b = (
        jax.random.uniform(kb, (n_out,), dtype=dtype, minval=-bound, maxval=bound)
        if bias
        else None
    )
    return LinearParams(w, b)


def apply_linear(p: LinearParams, x: Array) -> Array:
    out = x @ p.w.T
    if p.b is not None:
        out = out + p.b
    return out


def init_recognition(
    key: jax.Array,
    ydim: int,
    xdim: int,
    udim: int,
    hidden_sizes: Sequence[int],
    dtype=jnp.float32,
) -> RecognitionParams:
    """Input width is ``ydim + udim + 2*xdim`` (``vjf/recognition.py:20``)."""
    sizes = [ydim + udim + 2 * xdim, *hidden_sizes]
    keys = jax.random.split(key, len(hidden_sizes) + 2)
    layers = tuple(
        init_linear(keys[i], sizes[i], sizes[i + 1], bias=True, dtype=dtype)
        for i in range(len(hidden_sizes))
    )
    mean = init_linear(keys[-2], sizes[-1], xdim, bias=False, dtype=dtype)
    logvar = init_linear(keys[-1], sizes[-1], xdim, bias=True, dtype=dtype)
    return RecognitionParams(layers, mean, logvar)


# the reference takes the activation as a constructor arg (default Tanh,
# ``vjf/recognition.py:17``); the unused imports there (hardtanh, ReLU, ...)
# suggest the intended menu.
ACTIVATIONS = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "softplus": jax.nn.softplus,
    "identity": lambda x: x,
}


def apply_recognition(
    params: RecognitionParams,
    y: Array,
    qs: Gaussian,
    u: Optional[Array] = None,
    activation: str = "tanh",
) -> Gaussian:
    """q[t] = MLP(y[t], u[t], q[t-1]) — ``vjf/recognition.py:31-42``."""
    act = ACTIVATIONS[activation]
    yu = nonecat(y, u)
    h = jnp.concatenate([yu, jnp.atleast_2d(qs.mean), jnp.atleast_2d(qs.logvar)], axis=-1)
    for layer in params.layers:
        h = act(apply_linear(layer, h))
    return Gaussian(apply_linear(params.mean, h), apply_linear(params.logvar, h))
